package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric vectors (array<float> or array<double>),
  * accumulated left-to-right in double.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, +)` —
  * same element order, same double arithmetic, so results are
  * bit-identical to that composition and to a sequential SQL SUM — but
  * with whole-stage codegen over primitive array slots: no zipped-array
  * allocation, no lambda dispatch. The hot loop of brute-force cosine
  * similarity, near-dup scoring, and LSH projections.
  *
  * Lengths may differ; the scan stops at the shorter (zip_with would pad
  * with null -> null product -> null sum; pass equal-length vectors).
  *
  * A null ELEMENT inside the scanned range makes the result null — the
  * same outcome as the zip_with composition (null product poisons the
  * aggregate) — rather than reading garbage through a primitive getter.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two array<float> or two array<double> " +
          s"inputs, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  // null ELEMENTS poison the result, so the expression is nullable
  // whenever either array may contain one — not just when an input
  // itself may be null.
  override def nullable: Boolean = {
    def cn(e: Expression) = e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
    super.nullable || cn(left) || cn(right)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0.0
    if (elemIsFloat) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i)
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val get = if (elemIsFloat) "getFloat" else "getDouble"
      s"""
         |${ev.value} = 0.0;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  ${ev.value} += (double) $a.$get($i) * (double) $b.$get($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
