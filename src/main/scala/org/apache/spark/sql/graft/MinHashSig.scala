package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 12-chunk MinHash signature of a document in one pass: character
  * k-shingles at the given stride, each hashed twice (md5 of "a:"+s and
  * "b:"+s), minima tracked over the 12 five-hex-char (20-bit) chunks of
  * the two digests.
  *
  * Element j (1-based j+1 for element_at) equals the composition
  * `array_min(transform(shingles, s -> substring(md5('a:' || s),
  * 1 + 5*(j%6), 5)))` (ha for j < 6, hb for j >= 6): minima over
  * fixed-length lowercase-hex strings == minima over the 20-bit values
  * ('0'..'9' < 'a'..'f' keeps lexicographic == numeric), duplicates
  * can't change a min so shingle dedup is skipped, and a text shorter
  * than k contributes its single truncated shingle, exactly like
  * `substr(text, 1, k)`. The DuckDB oracle formula is unchanged.
  *
  * Why native: the composition walks interpreted higher-order lambdas
  * (substr + concat + md5 per element, never codegen'd) and builds two
  * 32-hex-char strings per shingle only to mine 5-char slices out of
  * them; this walks the code points once and hashes straight out of the
  * string's chars. Null input -> null.
  */
case class MinHashSig(child: Expression, k: Int, stride: Int)
    extends UnaryExpression {
  require(k >= 1 && stride >= 1, "k and stride must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], k, stride)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashSig.compute($c, $k, $stride)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinHashSig {
  def apply(text: Column, k: Int, stride: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), k, stride))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val prefixA = "a:".getBytes("UTF-8")
  private val prefixB = "b:".getBytes("UTF-8")
  private val hexDigits = "0123456789abcdef".toCharArray

  /** 20-bit value of hex chars [5c, 5c+5) of a 16-byte digest. */
  private def chunk(digest: Array[Byte], c: Int): Int = {
    var v = 0
    var p = 5 * c
    val end = p + 5
    while (p < end) {
      val b = digest(p >>> 1) & 0xff
      v = (v << 4) | (if ((p & 1) == 0) b >>> 4 else b & 0xf)
      p += 1
    }
    v
  }

  private def hex5(v: Int): UTF8String = {
    val cs = new Array[Char](5)
    var i = 0
    while (i < 5) { cs(i) = hexDigits((v >>> (4 * (4 - i))) & 0xf); i += 1 }
    UTF8String.fromString(new String(cs))
  }

  def compute(text: UTF8String, k: Int, stride: Int): ArrayData = {
    val s = text.toString
    // UTF-16 offset of each code point, so shingle windows (which count
    // code points, like Spark's substr) slice without re-scanning
    val len = s.length
    val offs = new Array[Int](s.codePointCount(0, len) + 1)
    var i = 0
    var m = 0
    while (i < len) {
      offs(m) = i
      m += 1
      i += Character.charCount(s.codePointAt(i))
    }
    offs(m) = len
    val digest = md5.get()
    val minA = Array.fill(6)(Int.MaxValue)
    val minB = Array.fill(6)(Int.MaxValue)
    // window starts: 0, stride, ... <= max(m - k, 0)  (always >= one)
    val lastStart = math.max(m - k, 0)
    var w = 0
    while (w <= lastStart) {
      val bytes = s.substring(offs(w), offs(math.min(w + k, m)))
        .getBytes("UTF-8")
      digest.reset()
      digest.update(prefixA)
      digest.update(bytes)
      val da = digest.digest()
      digest.reset()
      digest.update(prefixB)
      digest.update(bytes)
      val db = digest.digest()
      var c = 0
      while (c < 6) {
        val va = chunk(da, c)
        if (va < minA(c)) minA(c) = va
        val vb = chunk(db, c)
        if (vb < minB(c)) minB(c) = vb
        c += 1
      }
      w += stride
    }
    val out = new Array[AnyRef](12)
    var j = 0
    while (j < 6) {
      out(j) = hex5(minA(j))
      out(j + 6) = hex5(minB(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
