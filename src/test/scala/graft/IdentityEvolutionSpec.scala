package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Schema evolution THROUGH identity-column writes (r16 — the last
  * deliberate feature-composition refusals in the writer matrix,
  * lifted): delta-spark evolves these inline, committing ONE metaData
  * action that carries both the appended columns and the advanced
  * `delta.identity.highWaterMark`, with the identity field's own
  * metadata verbatim. These specs pin that contract for append and
  * keyed MERGE, the zero-insert evolution edge (schema declares, mark
  * stays), and the identity × column-mapped composition (fresh
  * physicalName/ids ratcheted past maxColumnId in the same commit). */
class IdentityEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("idevolve").toString + "/t"

  private def idMeta(start: Long, step: Long) = new MetadataBuilder()
    .putLong("delta.identity.start", start)
    .putLong("delta.identity.step", step)
    .build()

  private def commitJson(t: String, v: Long): String =
    Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json"))

  private def metaLines(t: String, v: Long): Seq[String] =
    commitJson(t, v).linesIterator
      .filter(_.contains("\"metaData\"")).toSeq

  private def schemaAt(t: String): StructType = {
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
  }

  test("append evolves an identity table: one metaData carries the new " +
      "column AND the advanced mark") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(10L, 2L)),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq("a", "b").toDF("v"), t, Seq.empty)
    // the evolving append: 'extra' is undeclared — pre-r16 this threw
    val v = MiniDelta.append(spark,
      Seq(("c", 7L), ("d", 8L)).toDF("v", "extra"), t, Seq.empty)
    val ml = metaLines(t, v)
    assert(ml.length == 1,
      s"identity evolution must commit exactly ONE metaData action, " +
        s"got ${ml.length}")
    assert(ml.head.contains("extra"), "evolved column not declared")
    assert(ml.head.contains("delta.identity.highWaterMark"),
      "the same metaData line must advance the mark")
    val sch = schemaAt(t)
    assert(sch.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(sch("id").metadata.getLong("delta.identity.highWaterMark")
      == 16L) // 10, 12 then 14, 16
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "v", "extra").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((10L, "a", None), (12L, "b", None),
      (14L, "c", Some(7L)), (16L, "d", Some(8L))))
  }

  test("merge evolves an identity table: matched keep ids, inserts " +
      "extend the chain, one metaData line") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("k", LongType),
      StructField("v", StringType))))
    MiniDelta.append(spark,
      Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("k", "v"),
      t, Seq.empty)
    // ids assigned 1..3; now merge an EVOLVING source: k=200 matches
    // (keeps its target id), k=900 inserts (id 4), both carry 'score'
    val v = MiniDelta.merge(spark, t,
      Seq((200L, "B", 0.5), (900L, "new", 0.9)).toDF("k", "v", "score"),
      Seq("k"), Seq.empty)
    val ml = metaLines(t, v)
    assert(ml.length == 1,
      s"evolving identity MERGE must commit exactly ONE metaData " +
        s"action, got ${ml.length}")
    assert(ml.head.contains("score") &&
      ml.head.contains("delta.identity.highWaterMark"))
    val sch = schemaAt(t)
    assert(sch.fieldNames.toSeq == Seq("id", "k", "v", "score"))
    assert(sch("id").metadata.getLong("delta.identity.highWaterMark")
      == 4L)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "k", "v", "score")
      .as[(Long, Long, String, Option[Double])]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq((1L, 100L, "a", None), (2L, 200L, "B", Some(0.5)),
      (3L, 300L, "c", None), (4L, 900L, "new", Some(0.9))))
  }

  test("merge evolution with zero inserts declares the schema; the " +
      "mark stays put") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("k", LongType),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq((100L, "a"), (200L, "b")).toDF("k", "v"),
      t, Seq.empty)
    val hwmBefore = schemaAt(t)("id").metadata
      .getLong("delta.identity.highWaterMark")
    // every source key matches: no insert, no mark movement — but the
    // evolved column must still be DECLARED (the zero-insert edge that
    // would silently lose the evolution if the metaData line only
    // rendered on mark advancement)
    val v = MiniDelta.merge(spark, t,
      Seq((100L, "A", 1L), (200L, "B", 2L)).toDF("k", "v", "extra"),
      Seq("k"), Seq.empty)
    val ml = metaLines(t, v)
    assert(ml.length == 1 && ml.head.contains("extra"))
    val sch = schemaAt(t)
    assert(sch.fieldNames.toSeq == Seq("id", "k", "v", "extra"))
    assert(sch("id").metadata.getLong("delta.identity.highWaterMark")
      == hwmBefore, "a matched-only merge must not move the mark")
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "k", "extra").as[(Long, Long, Option[Long])]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq((1L, 100L, Some(1L)), (2L, 200L, Some(2L))))
  }

  test("identity × column-mapped append evolution: fresh physicalName/" +
      "id ratchet in the SAME commit as the mark") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq("a").toDF("v"), t, Seq.empty)
    assert(MiniDelta.tableConfig(spark, t)(
      "delta.columnMapping.maxColumnId") == "2")
    val v = MiniDelta.append(spark, Seq(("b", "x")).toDF("v", "w"), t,
      Seq.empty)
    assert(metaLines(t, v).length == 1)
    MiniDelta.invalidateSnapshot(t)
    val cfg = MiniDelta.tableConfig(spark, t)
    assert(cfg("delta.columnMapping.maxColumnId") == "3",
      "mapped evolution must ratchet maxColumnId")
    val sch = schemaAt(t)
    val w = sch("w")
    assert(w.metadata.contains("delta.columnMapping.physicalName") &&
      w.metadata.getLong("delta.columnMapping.id") == 3L,
      "the evolved column needs its own mapping metadata")
    assert(sch("id").metadata.getLong("delta.identity.highWaterMark")
      == 2L)
    // the evolved column is stored under its PHYSICAL name: no data
    // file may carry the logical name 'w'
    val phys = w.metadata.getString("delta.columnMapping.physicalName")
    val files = Option(new java.io.File(t).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val cols = files.flatMap(p =>
      spark.read.parquet(p).columns.toSeq).toSet
    assert(cols.contains(phys) && !cols.contains("w"),
      s"expected physical column $phys (not logical 'w') in $cols")
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "v", "w").as[(Long, String, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", None), (2L, "b", Some("x"))))
  }

  test("OVERWRITE evolves an identity table: one metaData carries the " +
      "new column and the re-assigned chain's mark") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq("a", "b", "c").toDF("v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // the swap's rows assign PAST the surviving mark (4, 5) and the
    // frame carries a new column — pre-r16 the evolution refused
    val v = MiniDelta.overwrite(spark,
      Seq(("x", 1L), ("y", 2L)).toDF("v", "extra"), t, Seq.empty)
    val ml = metaLines(t, v)
    assert(ml.length == 1,
      s"evolving identity OVERWRITE must commit ONE metaData action, " +
        s"got ${ml.length}")
    assert(ml.head.contains("extra") &&
      ml.head.contains("delta.identity.highWaterMark"))
    val sch = schemaAt(t)
    assert(sch.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(sch("id").metadata.getLong("delta.identity.highWaterMark")
      == 5L)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "v", "extra").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((4L, "x", Some(1L)), (5L, "y", Some(2L))))
    // the SWAP form refuses only when it would DROP the identity
    // column (its metadata would vanish silently) — r17 narrowed the
    // pre-r17 blanket refusal to exactly that case
    val e = intercept[IllegalArgumentException](
      MiniDelta.overwrite(spark, Seq(("z", 9L)).toDF("v", "w"), t,
        Seq.empty, overwriteSchema = true))
    assert(e.getMessage.contains("overwriteSchema") &&
      e.getMessage.contains("drop"), e.getMessage)
  }

  test("overwriteSchema SWAP composes when the identity column is " +
      "KEPT: its spec carries onto the swapped field, the mark never " +
      "regresses, and the dropped column is gone") {
    val t = freshTable()
    val byDefault = new MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 1L)
      .putBoolean("delta.identity.allowExplicitInsert", true).build()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, byDefault),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq("a", "b", "c").toDF("v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // swap: keeps id (values PROVIDED — BY DEFAULT allows), drops v,
    // adds w — the identity spec must carry onto the swapped field and
    // the mark sync past the provided extremum (pre-swap mark was 3)
    val v = MiniDelta.overwrite(spark,
      Seq((7L, "x"), (9L, "y")).toDF("id", "w"), t, Seq.empty,
      overwriteSchema = true)
    val sch = schemaAt(t)
    assert(sch.fieldNames.toSeq == Seq("id", "w"))
    val idF = sch("id")
    assert(idF.metadata.getLong("delta.identity.start") == 1L)
    assert(idF.metadata.getBoolean("delta.identity.allowExplicitInsert"))
    assert(idF.metadata.getLong("delta.identity.highWaterMark") == 9L,
      idF.metadata.json)
    // ONE metaData action carries the swapped schema AND the mark
    assert(metaLines(t, v).length == 1)
    // post-swap appends continue the chain PAST the synced mark
    MiniDelta.append(spark, Seq("zz").toDF("w"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "w").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((7L, "x"), (9L, "y"), (10L, "zz")), out.toString)
    // GENERATED ALWAYS still refuses PROVIDED values through the swap
    // (the identity-value rule, not the swap rule)
    val t2 = freshTable()
    MiniDelta.createTable(spark, t2, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq("a").toDF("v"), t2, Seq.empty)
    MiniDelta.invalidateSnapshot(t2)
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.overwrite(spark, Seq((5L, "x")).toDF("id", "w"), t2,
        Seq.empty, overwriteSchema = true))
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
  }

  test("identity × column-mapped MERGE evolution composes the same way") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(1L, 1L)),
      StructField("k", LongType),
      StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((10L, "a"), (20L, "b")).toDF("k", "v"),
      t, Seq.empty)
    val v = MiniDelta.merge(spark, t,
      Seq((20L, "B", 5L), (30L, "c", 6L)).toDF("k", "v", "n"),
      Seq("k"), Seq.empty)
    assert(metaLines(t, v).length == 1)
    MiniDelta.invalidateSnapshot(t)
    val sch = schemaAt(t)
    assert(sch("n").metadata.contains("delta.columnMapping.physicalName"))
    assert(MiniDelta.tableConfig(spark, t)(
      "delta.columnMapping.maxColumnId") == "4")
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "k", "v", "n").as[(Long, Long, String, Option[Long])]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq((1L, 10L, "a", None), (2L, 20L, "B", Some(5L)),
      (3L, 30L, "c", Some(6L))))
  }
}
