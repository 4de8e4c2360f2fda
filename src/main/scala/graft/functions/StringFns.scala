package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string/date/parse functions (SURVEY §2.6 F1-F14).
  *
  * All are composed from codegen'd built-ins (`org.apache.spark.sql
  * .functions`) — no Scala UDFs — so they stay inside whole-stage codegen
  * and their DuckDB-SQL oracle equivalents are exact.
  */
object StringFns {

  /** F1 xml escape: & < > " ' -> entities; output-identical to the
    * reference's &-first chained replaces
    * (/root/reference/src/main.rs:192-198), executed as a single-pass
    * native codegen expression. */
  def xmlEscape(c: Column): Column =
    org.apache.spark.sql.graft.XmlEscape(c)

  /** The five-step replace chain (reference's literal algorithm); kept as
    * the differential-test partner of the native expression. */
  def xmlEscapeChained(c: Column): Column = {
    val steps = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
      "\"" -> "&quot;", "'" -> "&apos;")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }

  /** F2: AWS SigV4 Authorization header -> access-key id
    * (/root/reference/src/main.rs:1129-1135). */
  def extractAwsUser(auth: Column): Column =
    regexp_extract(auth, "Credential=([^/]+)/", 1)

  /** F3: s3://bucket/prefix -> bucket (/root/reference/src/main.rs:71-75). */
  def s3Bucket(uri: Column): Column =
    regexp_extract(uri, "^s3://([^/]+)", 1)

  /** F3: s3://bucket/prefix -> prefix, trailing '/' trimmed. */
  def s3Prefix(uri: Column): Column =
    regexp_replace(regexp_extract(uri, "^s3://[^/]+/(.*)$", 1), "/+$", "")

  /** F4: first path segment = table alias
    * (/root/reference/src/main.rs:498-501). */
  def pathAlias(path: Column): Column = substring_index(path, "/", 1)

  /** F4: remainder after the first '/' (the in-table file path). */
  def pathRest(path: Column): Column =
    path.substr(instr(path, "/") + 1, length(path))

  /** F10: presigned-URL detection
    * (/root/reference/utils/local_proxy.py:185). */
  def isPresigned(url: Column): Column =
    url.like("%Signature=%") || url.like("%X-Amz-Signature=%")

  /** F13: composite cache key user:table
    * (/root/reference/src/main.rs:377). */
  def cacheKey(user: Column, table: Column): Column =
    concat_ws(":", user, table)

  /** F14: Range header `bytes=a-b` -> start offset. */
  def rangeStart(range: Column): Column =
    regexp_extract(range, "bytes=([0-9]+)-", 1).cast("long")

  /** F14: Range header `bytes=a-b` -> end offset (inclusive). */
  def rangeEnd(range: Column): Column =
    regexp_extract(range, "bytes=[0-9]+-([0-9]+)", 1).cast("long")

  /** F14: byte length of the inclusive range. */
  def rangeLen(range: Column): Column =
    rangeEnd(range) - rangeStart(range) + 1

  /** F8: S3 XML timestamp format (2024-01-01T00:00:00.000Z). Kept at
    * whole-second precision + literal millis so the DuckDB strftime
    * oracle matches exactly (/root/reference/src/main.rs:128-131). */
  def s3Timestamp(ts: Column): Column =
    concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), lit(".000Z"))

  /** F8: RFC-1123 HTTP date (/root/reference/src/main.rs:756). */
  def httpDate(ts: Column): Column =
    concat(date_format(ts, "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT"))

  /** F6: lenient query-string decode -> map
    * (/root/reference/src/main.rs:467-473). */
  def queryMap(qs: Column): Column = str_to_map(qs, lit("&"), lit("="))

  /** F6: single query parameter (null when absent). */
  def queryParam(qs: Column, key: String): Column =
    element_at(queryMap(qs), key)

  /** F7: lenient int parse (bad values -> null)
    * (/root/reference/src/main.rs:258-261). */
  def tryInt(c: Column): Column = c.try_cast("int")
}
