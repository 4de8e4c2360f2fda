package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Decoder (and test-side encoder) for the REAL Delta deletion-vector
  * payload: a `RoaringBitmapArray` in the protocol's "portable" format —
  * a 4-byte magic number, a count of 32-bit roaring bitmaps, and for
  * each bitmap its high-32-bit key plus a standard portable-format
  * RoaringBitmap (RoaringFormatSpec). Masked row indexes are
  * `key << 32 | value32`.
  *
  * Storage forms (the add action's `deletionVector` descriptor,
  * reference consumers read these via delta-rs,
  * /root/reference/src/main.rs:357-363):
  *  - `i`: the payload rides INLINE in `pathOrInlineDv`, Z85-encoded.
  *  - `u`: `pathOrInlineDv` = optional random prefix + 20-char Z85 UUID;
  *    the payload lives in `<prefix>/deletion_vector_<uuid>.bin` under
  *    the table root at byte `offset`, framed as
  *    [size i32 BE][payload][CRC-32 of payload, i32 BE].
  *  - `p`: like `u` but `pathOrInlineDv` is the absolute file path.
  *
  * Scale note: bitmaps are small by construction (a million masked rows
  * compresses to ~100 KB), so the driver fetches BYTES only; decoding
  * explodes to row indexes inside executors ([[MiniDelta]] mask join).
  */
object RoaringDv {

  /** Magic number of the portable RoaringBitmapArray serialization. */
  val Magic: Int = 1681511377

  final class DvFormatException(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------- Z85
  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85 decode (RFC 32/Z85: 5 chars -> 4 bytes, big-endian base 85). */
  def z85ToBytes(s: String): Array[Byte] = {
    if (s.length % 5 != 0)
      throw new DvFormatException(s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val v = if (c < 128) z85Decode(c) else -1
        if (v < 0) throw new DvFormatException(s"invalid Z85 char '${s.charAt(i + j)}'")
        acc = acc * 85 + v
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte
      out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte
      out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  def bytesToZ85(b: Array[Byte]): String = {
    require(b.length % 4 == 0, "Z85 encodes 4-byte groups")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (b(i + j) & 0xffL); j += 1 }
      val cs = new Array[Char](5)
      var k = 4
      while (k >= 0) { cs(k) = z85Alphabet(((acc % 85)).toInt); acc /= 85; k -= 1 }
      sb.appendAll(cs)
      i += 4
    }
    sb.toString
  }

  /** The on-disk DV file for a `u`/`p` descriptor. `u` splits
    * `pathOrInlineDv` into an optional random prefix plus the final
    * 20 Z85 chars (a 16-byte UUID). */
  def dvFileOf(tableRoot: String, storageType: String,
               pathOrInlineDv: String): String = storageType match {
    case "p" => pathOrInlineDv
    case "u" =>
      if (pathOrInlineDv.length < 20)
        throw new DvFormatException(s"'u' DV id too short: $pathOrInlineDv")
      val prefix = pathOrInlineDv.dropRight(20)
      val raw = z85ToBytes(pathOrInlineDv.takeRight(20))
      val bb = ByteBuffer.wrap(raw)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) tableRoot else s"$tableRoot/$prefix"
      s"$dir/deletion_vector_$uuid.bin"
    case other =>
      throw new DvFormatException(s"unsupported DV storageType '$other'")
  }

  /** Fetch the serialized bitmap BYTES for a descriptor (driver-side;
    * payloads are compressed-bitmap small). File forms verify the
    * frame: size must equal the descriptor's `sizeInBytes` and the
    * CRC-32 must match — a torn DV silently unmasking rows is a
    * correctness hole, so both failures throw. */
  def fetch(fs: org.apache.hadoop.fs.FileSystem, tableRoot: String,
            storageType: String, pathOrInlineDv: String,
            offset: Int, sizeInBytes: Int): Array[Byte] = {
    if (storageType == "i") {
      val out = z85ToBytes(pathOrInlineDv)
      // the inline form tears too: a truncated pathOrInlineDv that is
      // still valid Z85 would decode fewer bytes than declared and
      // silently unmask rows (Z85 pads to 4-byte groups, so decoded
      // length may legitimately exceed sizeInBytes, never undershoot)
      if (out.length < sizeInBytes)
        throw new DvFormatException(
          s"inline DV decodes to ${out.length} bytes < declared $sizeInBytes")
      return out
    }
    val path = new org.apache.hadoop.fs.Path(
      dvFileOf(tableRoot, storageType, pathOrInlineDv))
    val in = fs.open(path)
    try {
      val off = if (offset < 0) 1L else offset.toLong // after version byte
      in.seek(off)
      val head = new Array[Byte](4)
      in.readFully(head)
      val size = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN).getInt
      if (size != sizeInBytes)
        throw new DvFormatException(
          s"DV frame size $size != descriptor sizeInBytes $sizeInBytes ($path)")
      val data = new Array[Byte](size)
      in.readFully(data)
      val tail = new Array[Byte](4)
      in.readFully(tail)
      val want = ByteBuffer.wrap(tail).order(ByteOrder.BIG_ENDIAN).getInt
      val crc = new java.util.zip.CRC32
      crc.update(data)
      if (crc.getValue.toInt != want)
        throw new DvFormatException(s"DV checksum mismatch ($path)")
      data
    } finally in.close()
  }

  /** Decode a portable RoaringBitmapArray payload to its row indexes
    * (ascending). Array, bitmap, and run containers per
    * RoaringFormatSpec. */
  def decode(payload: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    if (magic != Magic)
      throw new DvFormatException(s"bad RoaringBitmapArray magic $magic")
    val nBitmaps = bb.getLong
    if (nBitmaps < 0 || nBitmaps > Int.MaxValue)
      throw new DvFormatException(s"bitmap count $nBitmaps out of range")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var b = 0L
    while (b < nBitmaps) {
      val key = bb.getInt.toLong & 0xffffffffL
      decodeBitmap(bb, v32 => out += (key << 32) | (v32 & 0xffffffffL))
      b += 1
    }
    out.result()
  }

  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** One standard 32-bit RoaringBitmap, read in place from `bb`. */
  private def decodeBitmap(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt
    val hasRun = (cookie & 0xffff) == SerialCookie
    val n =
      if (hasRun) (cookie >>> 16) + 1
      else if (cookie == SerialCookieNoRun) bb.getInt
      else throw new DvFormatException(s"bad roaring cookie $cookie")
    val runBits =
      if (hasRun) {
        val bytes = new Array[Byte]((n + 7) / 8)
        bb.get(bytes)
        bytes
      } else Array.empty[Byte]
    def isRun(i: Int) =
      hasRun && (runBits(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    if (!hasRun || n >= NoOffsetThreshold) bb.position(bb.position() + 4 * n)
    i = 0
    while (i < n) {
      val hi = keys(i) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { emit(hi | (bb.getShort & 0xffff)); c += 1 }
      } else {
        // 8 KiB bitset, words little-endian
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val base = hi | (w << 6)
          while (word != 0) {
            emit(base | java.lang.Long.numberOfTrailingZeros(word))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Encode row indexes as a portable RoaringBitmapArray (array/bitmap
    * containers, no runs) — the fixture side of the round-trip spec and
    * the writer for [[MiniDelta]]-produced interop tables. */
  def encode(values: Seq[Long]): Array[Byte] = {
    val byKey = values.distinct.sorted
      .groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    val bos = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def i16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    i32(Magic)
    i32(byKey.size); i32(0) // i64 LE bitmap count
    byKey.foreach { case (key, vs32) =>
      i32(key)
      val conts = vs32.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      i32(SerialCookieNoRun); i32(conts.size)
      conts.foreach { case (k, cv) => i16(k); i16(cv.size - 1) }
      // offset header (required for the no-run cookie): byte offset of
      // each container from the start of this bitmap's serialization —
      // cookie(4) + count(4) + descriptive(4/cont) + offsets(4/cont)
      var off = 4 + 4 + 4 * conts.size + 4 * conts.size
      conts.foreach { case (_, cv) =>
        i32(off)
        off += (if (cv.size <= 4096) 2 * cv.size else 8192)
      }
      conts.foreach { case (_, cv) =>
        val lows = cv.map(_ & 0xffff).sorted
        if (lows.size <= 4096) lows.foreach(i16)
        else {
          val words = new Array[Long](1024)
          lows.foreach(v => words(v >>> 6) |= 1L << (v & 63))
          words.foreach { w =>
            var i = 0
            while (i < 8) { bos.write(((w >>> (8 * i)) & 0xff).toInt); i += 1 }
          }
        }
      }
    }
    bos.toByteArray
  }

  /** Write a `u`-storage DV file (version byte + framed payload) and
    * return the descriptor's `pathOrInlineDv` (no prefix). Test/interop
    * writer side of [[fetch]]. */
  def writeDvFile(fs: org.apache.hadoop.fs.FileSystem, tableRoot: String,
                  payload: Array[Byte]): (String, Int, Int) = {
    val (id, frames) = writePackedDvFile(fs, tableRoot, Seq("_" -> payload))
    val (off, size) = frames("_")
    (id, off, size)
  }

  /** Write ONE `u`-storage DV file holding each keyed payload at its
    * own offset — how real Delta writers pack a commit's deletion
    * vectors. Returns the shared `pathOrInlineDv` and each key's
    * (offset, sizeInBytes). */
  def writePackedDvFile(fs: org.apache.hadoop.fs.FileSystem,
                        tableRoot: String,
                        payloads: Seq[(String, Array[Byte])])
      : (String, Map[String, (Int, Int)]) = {
    val uuid = java.util.UUID.randomUUID()
    val raw = ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    val id = bytesToZ85(raw)
    val p = new org.apache.hadoop.fs.Path(
      s"$tableRoot/deletion_vector_$uuid.bin")
    val out = fs.create(p, true)
    val frames = Map.newBuilder[String, (Int, Int)]
    try {
      out.write(1) // format version
      var pos = 1
      payloads.foreach { case (key, payload) =>
        frames += key -> ((pos, payload.length))
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(payload.length).array())
        out.write(payload)
        val crc = new java.util.zip.CRC32
        crc.update(payload)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(crc.getValue.toInt).array())
        pos += 4 + payload.length + 4
      }
    } finally out.close()
    (id, frames.result())
  }
}
