package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** `bins`-bucket histogram of a binary payload's byte values modulo
  * `bins`, in one pass — element i counts bytes b with
  * (b & 0xff) % bins == i. The feature-extraction kernel of the
  * multimodal pipeline (a real build swaps this scan for a codec
  * feature map; the per-row single-pass shape is what matters).
  * Equals, for bins=16, the composition exploding every byte position
  * and grouping by `conv(hex(substring(payload, i, 1)), 16, 10) % 16`
  * — but with no row explosion at all. Null input -> null.
  */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression {
  require(bins >= 1 && bins <= 256, "bins must be in 1..256")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_histogram requires a binary input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override def nullSafeEval(input: Any): Any =
    ByteHistogram.compute(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ByteHistogram.compute($c, $bins)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ByteHistogram {
  def apply(payload: Column, bins: Int): Column =
    ColumnBridge.column(ByteHistogram(ColumnBridge.expression(payload), bins))

  def compute(bytes: Array[Byte], bins: Int): GenericArrayData = {
    val counts = new Array[Long](bins)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) % bins) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}
