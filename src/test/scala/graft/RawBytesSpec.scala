package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.io.RawBytes

class RawBytesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binaryFile scan + HEAD + ranged slice") {
    val dir = Files.createTempDirectory("rawbytes")
    Files.write(dir.resolve("a.bin"), "0123456789".getBytes("UTF-8"))
    Files.write(dir.resolve("b.bin"), Array[Byte](0, 1, 2, 3, -1, -2))

    val df = RawBytes.read(spark, dir.toString, "*.bin")
    assert(df.count() == 2)

    val headRow = RawBytes.head(spark, dir.toString)
      .where(org.apache.spark.sql.functions.col("path").endsWith("a.bin"))
      .collect()(0)
    assert(headRow.getAs[Long]("length") == 10L)

    // bytes=0-4 -> "01234" (the reference's range fixture,
    // tests/test_proxy_integration.py:133-145)
    val ranged = RawBytes.ranged(df, 0, 5)
      .where(org.apache.spark.sql.functions.col("path").endsWith("a.bin"))
      .collect()(0)
    assert(new String(ranged.getAs[Array[Byte]]("range_content"), "UTF-8")
      == "01234")
    assert(ranged.getAs[Long]("range_len") == 5L)

    // binary fidelity incl. high bytes (test_proxy_integration.py:121-131)
    val b = df.where(org.apache.spark.sql.functions.col("path")
      .endsWith("b.bin")).collect()(0).getAs[Array[Byte]]("content")
    assert(b.toSeq == Seq[Byte](0, 1, 2, 3, -1, -2))
  }
}
