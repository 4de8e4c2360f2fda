package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a document in one pass — equals the composition
  * that explodes (token x bit) rows: md5 each non-empty whitespace
  * token, bit j of the hash = bit (j mod 4) of hex nibble floor(j/4)
  * (the first 8 hex chars of the digest), each token votes +1/-1 per
  * bit weighted by multiplicity, and bit j of the result is set iff
  * the vote sum is positive.
  *
  * The composition shuffles docs x tokens x 32 rows through two
  * groupBys; this walks each document's tokens once and keeps 32 vote
  * counters on the stack — same result, no explosion, no shuffle
  * (verified bit-identical by the parity spec). Null input -> null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](32)
    val digest = md5.get()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          digest.reset()
          digest.update(bytes, start, i - start)
          val d = digest.digest()
          var j = 0
          while (j < 32) {
            val k = j >>> 2 // hex char index
            val b = d(k >>> 1) & 0xff
            val nib = if ((k & 1) == 0) b >>> 4 else b & 0xf
            votes(j) += (((nib >>> (j & 3)) & 1) << 1) - 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) h |= 1L << j
      j += 1
    }
    h
  }
}
