package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC FAKE (`fakeDecode`) — the Spark-side
  * plumbing is real: binary column, typed Dataset, partition-iterator
  * decode (the Scala analogue of an arrow-batched `mapInPandas` decode),
  * and a metadata schema a real decoder would fill in.
  *
  * Scale: decode runs per-partition with no shuffle; a real
  * implementation swaps `fakeDecode` for a codec call and nothing else
  * changes. Payload bytes never hit the driver.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, sha: String,
                       width: Int, height: Int, n_frames: Int)

  /** Stand-in payloads: utf-8 bytes of the fixture text. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))

  /** DETERMINISTIC FAKE decoder: derives "media" dimensions from the raw
    * bytes. A real build replaces this body with a codec invocation. */
  def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    MediaMeta(docId, bytes.length.toLong, sha,
      width = 1 + b0 % 64, height = 1 + b1 % 64,
      n_frames = 1 + (bytes.length % 7))
  }

  /** Decode via partition iterators (mapInPandas analogue). */
  def decode(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(docs).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  /** Same metadata derived with pure codegen'd expressions — used as the
    * oracle-checkable form and as a cross-check of `decode`. Bytes are
    * extracted WITHOUT a string cast (substring on binary yields a binary
    * slice; hex -> base-10) so the values match `fakeDecode`'s raw-byte
    * reads for ANY payload, including non-UTF-8 binary media. */
  def metaExpr(docs: DataFrame): DataFrame = {
    def byteAt(pos: Int): Column = coalesce(
      nullif(conv(hex(substring(col("payload"), pos, 1)), 16, 10), lit("")),
      lit("0")).cast("int")
    payloads(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha"),
      (lit(1) + pmod(byteAt(1), lit(64))).as("width"),
      (lit(1) + pmod(byteAt(2), lit(64))).as("height"),
      (lit(1) + pmod(length(col("payload")), lit(7))).as("n_frames"))
      .orderBy("doc_id")
  }
}
