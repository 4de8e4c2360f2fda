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

  /** Feature extraction: 16-bin low-nibble byte histogram per payload —
    * the feature-vector stand-in a real build would replace with e.g. a
    * color histogram or an embedding model call. One native pass per
    * payload ([[org.apache.spark.sql.graft.ByteHistogram]]); rows for
    * empty bins are dropped (sparse form). */
  def featureHistogram(docs: DataFrame): DataFrame =
    payloads(docs)
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graft.ByteHistogram(col("payload"), 16)))
      .where(col("col") > 0)
      .select(col("doc_id"), col("pos").cast("long").as("bin"),
        col("col").as("n"))
      .orderBy("doc_id", "bin")

  /** Resize: fit (width, height) into a maxDim box preserving aspect
    * ratio, integer arithmetic only (deterministic, engine-portable).
    * A real build would hand these dims to the codec. */
  def resizeDims(width: Column, height: Column, maxDim: Int)
      : (Column, Column) = {
    val mx = greatest(width, height)
    // floor(side*maxDim / mx) in doubles: the numerator is an exact
    // small integer, so the division rounds identically in any engine
    // and floor is exact — no truncate-vs-round cast hazards
    def fit(side: Column) =
      when(mx <= maxDim, side.cast("long"))
        .otherwise(greatest(lit(1L), floor(side * maxDim / mx)))
        .cast("long")
    (fit(width), fit(height))
  }

  /** Frame sampling: every `stride`-th frame index of each payload's
    * fake frame count (1 + n_bytes % 7). Real build: these indices
    * drive the demuxer's seek; the plumbing (explode of a per-row
    * sequence, no shuffle) is what scales. */
  def sampleFrames(docs: DataFrame, stride: Int): DataFrame =
    payloads(docs)
      .select(col("doc_id"),
        (lit(1) + pmod(length(col("payload")), lit(7))).as("n_frames"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

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
