package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH bucket id of a vector: bit p of the result is the sign of
  * the projection onto deterministic pseudo-hyperplane p, whose
  * component i is ((i*2654435761 + p*40503) mod 65536) - 32768 — a
  * fixed integer hash, no RNG state, identical in any engine.
  *
  * Equals the `aggregate(zip_with(...))` composition in
  * graft.llm.Similarity.lshBucketComposed: the accumulator runs
  * left-to-right in double with the same element products, so the
  * projections are bit-identical (parity spec) — but one pass over the
  * primitive array instead of `planes` interpreted folds with a zipped
  * allocation each. Null input -> null.
  */
case class SignLshBucket(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, "planes must be in 1..63")

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_bucket requires array<float>/array<double>, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    SignLshBucket.compute(input.asInstanceOf[ArrayData], dim, planes,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SignLshBucket.compute($c, $dim, $planes, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SignLshBucket {
  def apply(v: Column, dim: Int, planes: Int): Column =
    ColumnBridge.column(
      SignLshBucket(ColumnBridge.expression(v), dim, planes))

  def compute(v: ArrayData, dim: Int, planes: Int,
              isFloat: Boolean): Long = {
    // parity with the zip_with composition: a length mismatch there
    // null-pads, the null product poisons every fold, and all sign
    // bits come out 0 — mirror that instead of a partial projection
    if (v.numElements() != dim) return 0L
    val n = dim
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val w = ((i.toLong * 2654435761L + p.toLong * 40503L) % 65536L -
          32768L).toDouble
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * w
        i += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}
