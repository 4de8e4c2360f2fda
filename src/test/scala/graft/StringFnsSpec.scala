package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringFns

class StringFnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(c: org.apache.spark.sql.Column): String =
    spark.range(1).select(c.cast("string")).collect()(0).getString(0)

  test("xmlEscape escapes all five entities, ampersand first") {
    assert(one(StringFns.xmlEscape(lit("""a&<>"'z"""))) ==
      "a&amp;&lt;&gt;&quot;&apos;z")
    // already-escaped input gets double-escaped (reference behavior of
    // naive chained replaces, src/main.rs:192-198)
    assert(one(StringFns.xmlEscape(lit("&amp;"))) == "&amp;amp;")
  }

  test("extractAwsUser pulls the access key id") {
    assert(one(StringFns.extractAwsUser(
      lit("AWS4-HMAC-SHA256 Credential=AKIAXYZ/20240101/us-east-1"))) ==
      "AKIAXYZ")
  }

  test("s3 uri parse: bucket + prefix with trailing slash trimmed") {
    val uri = lit("s3://my-bucket/some/prefix/")
    assert(one(StringFns.s3Bucket(uri)) == "my-bucket")
    assert(one(StringFns.s3Prefix(uri)) == "some/prefix")
  }

  test("path alias/rest split on first slash") {
    val p = lit("trades/year=2023/f1.parquet")
    assert(one(StringFns.pathAlias(p)) == "trades")
    assert(one(StringFns.pathRest(p)) == "year=2023/f1.parquet")
  }

  test("presigned url detection") {
    assert(one(StringFns.isPresigned(lit("https://x?X-Amz-Signature=s"))) == "true")
    assert(one(StringFns.isPresigned(lit("https://x?Signature=s"))) == "true")
    assert(one(StringFns.isPresigned(lit("https://x?foo=1"))) == "false")
  }

  test("range header parse: bytes=a-b inclusive") {
    val r = lit("bytes=0-14")
    assert(one(StringFns.rangeStart(r)) == "0")
    assert(one(StringFns.rangeEnd(r)) == "14")
    assert(one(StringFns.rangeLen(r)) == "15")
  }

  test("query map decode + lenient int parse") {
    val qs = lit("list-type=2&prefix=t/&max-keys=50")
    assert(one(StringFns.queryParam(qs, "prefix")) == "t/")
    assert(one(StringFns.tryInt(StringFns.queryParam(qs, "max-keys"))) == "50")
    assert(spark.range(1)
      .select(StringFns.tryInt(lit("nope")).isNull).collect()(0).getBoolean(0))
  }

  test("cache key composition") {
    assert(one(StringFns.cacheKey(lit("alice"), lit("trades"))) ==
      "alice:trades")
  }

  test("timestamp renders: S3 ISO and RFC-1123") {
    val ts = to_timestamp(lit("2024-03-05 07:08:09"))
    assert(one(StringFns.s3Timestamp(ts)) == "2024-03-05T07:08:09.000Z")
    assert(one(StringFns.httpDate(ts)) == "Tue, 05 Mar 2024 07:08:09 GMT")
  }
}
