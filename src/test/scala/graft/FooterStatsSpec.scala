package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Footer-derived stats (r14 fileStats fast path): min/max must come
  * straight from the parquet footers with NO second pass over the
  * data, and mean exactly what the one-aggregate fallback would have
  * written — for every supported kind, including the micro-precision
  * timestamp rendering and all-null columns. (GoldenFormatSpec pins
  * the long/string renderings byte-for-byte against the
  * aggregate-era goldens; this spec covers the rest semantically.) */
class FooterStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("fstats").toString + "/t"

  test("footer stats match the data for every supported kind") {
    val t = freshTable()
    val rows = Seq(
      (1L, 7, 2.5d, 1.5f, true, "beta", Timestamp.valueOf(
        "2024-01-02 03:04:05.123456"), java.sql.Date.valueOf("2024-01-02"),
        null.asInstanceOf[String]),
      (9L, -3, -0.25d, 9.75f, false, "alpha", Timestamp.valueOf(
        "2023-12-31 23:59:59.999999"), java.sql.Date.valueOf("2023-11-20"),
        null.asInstanceOf[String]),
      (4L, 0, 100.0d, 0.0f, true, "gamma", Timestamp.valueOf(
        "2024-06-15 00:00:00"), java.sql.Date.valueOf("2024-06-15"),
        null.asInstanceOf[String]))
      .toDF("l", "i", "d", "f", "b", "s", "ts", "dt", "allnull")
      .coalesce(1)
    MiniDelta.append(spark, rows, t, Seq.empty)
    val stats = MiniDelta.snapshotFiles(spark, t)
      .select("stats").collect().map(_.getString(0))
    assert(stats.length == 1 && stats.head != null)
    val js = stats.head
    // parse through Spark so the values mean what a READER computes
    val parsed = spark.read.json(Seq(js).toDS)
    val mn = parsed.select("minValues.*").collect()(0)
    val mx = parsed.select("maxValues.*").collect()(0)
    def g(r: org.apache.spark.sql.Row, n: String): Any =
      r.get(r.fieldIndex(n))
    assert(g(mn, "l") == 1L && g(mx, "l") == 9L)
    assert(g(mn, "i") == -3L && g(mx, "i") == 7L) // json reads ints as long
    assert(g(mn, "d") == -0.25d && g(mx, "d") == 100.0d)
    assert(g(mn, "f") == 0.0d && g(mx, "f") == 9.75d)
    assert(g(mn, "b") == false && g(mx, "b") == true)
    assert(g(mn, "s") == "alpha" && g(mx, "s") == "gamma")
    // timestamp strings keep MICRO precision and cast back exactly
    assert(g(mn, "ts").toString.contains("2023-12-31 23:59:59.999999"), js)
    assert(g(mx, "ts").toString.contains("2024-06-15 00:00:00"), js)
    assert(g(mn, "dt") == "2023-11-20" && g(mx, "dt") == "2024-06-15")
    // all-null column: stat entries null, never a fabricated value
    assert(mn.isNullAt(mn.fieldIndex("allnull")) &&
      mx.isNullAt(mx.fieldIndex("allnull")), js)
    assert(js.contains("\"numRecords\":3"), js)
    // ...and skipping consumes them: a range outside [1, 9] prunes
    assert(MiniDelta.filesForRange(
      MiniDelta.snapshotFiles(spark, t), "l", 50, 60).count() == 0)
    // timestamp-bounded DML discovery prunes on the footer stats too
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t,
      col("ts") >= lit(Timestamp.valueOf("2030-01-01 00:00:00")),
      Seq.empty)
    assert(MiniDelta.dmlManifestRows.get() - before == 0,
      "a bound above every footer max must collect nothing")
  }

  test("footer stats survive multi-file commits and partitions") {
    val t = freshTable()
    val df = spark.range(200)
      .select(col("id"), (col("id") % 4).cast("string").as("p"),
        concat(lit("v"), lpad(col("id").cast("string"), 3, "0")).as("s"))
      .repartition(4, col("id"))
    MiniDelta.append(spark, df, t, Seq("p"))
    val snap = MiniDelta.snapshotFiles(spark, t)
    val all = snap.select("stats").collect().map(_.getString(0))
    assert(all.nonEmpty && all.forall(s => s != null &&
      s.contains("\"id\"") && s.contains("\"s\"") && !s.contains("\"p\"")))
    // the union of per-file ranges covers the data exactly
    val lo = MiniDelta.filesForRange(snap, "id", 0, 0).count()
    assert(lo >= 1 && lo < snap.count())
  }

  test("footer-defeating kinds fall back INTO the aggregate pass") {
    // the aggregateWouldStat mirror: a decimal column is min/max-able
    // by the aggregate but NOT footer-faithful, so the whole footer
    // path must fail INTO the aggregate — a mirror bug here would
    // silently drop stats for every defaulted write carrying such a
    // column, and nothing else would notice (skipping just degrades)
    val t = freshTable()
    val rows = Seq((1L, BigDecimal("12.34")), (9L, BigDecimal("-5.60")),
      (4L, BigDecimal("99.99")))
      .toDF("l", "dec")
      .select(col("l"), col("dec").cast("decimal(10,2)").as("dec"))
      .coalesce(1)
    MiniDelta.append(spark, rows, t, Seq.empty)
    val js = MiniDelta.snapshotFiles(spark, t)
      .select("stats").collect().map(_.getString(0))
    assert(js.length == 1 && js.head != null,
      "stats must still land (via the aggregate) when the footer " +
        "path cannot answer")
    assert(js.head.contains("\"numRecords\":3"), js.head)
    // BOTH columns stat — the long must not be dropped just because
    // the decimal defeated the footer path; the decimal's SCALE
    // survives in the JSON (raw-text check: json parsing would
    // collapse -5.60 to a double)
    assert(js.head.contains("\"minValues\":{\"l\":1,\"dec\":-5.60}"),
      js.head)
    assert(js.head.contains("\"maxValues\":{\"l\":9,\"dec\":99.99}"),
      js.head)
    // and the stats are consumable: a range outside [-5.60, 99.99]
    // prunes the file
    assert(MiniDelta.filesForRange(
      MiniDelta.snapshotFiles(spark, t), "dec", 200, 300).count() == 0)
  }
}
