package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) code: interleave the low `bits` bits of each child
  * round-robin — bit `i` of child `c` lands at result bit `i*n + c` —
  * so a sort on the code is a space-filling curve over all children:
  * files cut from contiguous code ranges cover small hyper-rectangles,
  * and min/max stats discriminate on EVERY participating column, not
  * just the leading sort key. This is OPTIMIZE ZORDER's kernel
  * (multi-dimensional generalization of the 1-D clusterBy in
  * graft.io.MiniDelta.compact).
  *
  * Children are `bits`-bit NON-NEGATIVE ints (the caller min-max
  * normalizes; graft.operators.ZOrder does); values outside the range
  * are masked. `n * bits` must fit a signed long. Null in any child ->
  * null (callers coalesce first, keeping null ordering decisions
  * explicit). Equals the shift-or composition in
  * graft.operators.ZOrder.interleaveComposed (parity spec).
  */
case class InterleaveBits(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2 && children.size <= 8,
    "interleave_bits takes 2..8 columns")
  require(bits >= 1 && children.size * bits <= 63,
    s"${children.size} cols * $bits bits must fit a signed long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires int columns, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_bits"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var c = 0
    while (c < children.size) {
      val v = children(c).eval(input)
      if (v == null) return null
      vals(c) = v.asInstanceOf[Int]
      c += 1
    }
    InterleaveBits.compute(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("vals")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString(" ")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          int[] $arr = new int[${children.size}];
          $fill
          ${ev.value} =
            org.apache.spark.sql.graft.InterleaveBits.compute($arr, $bits);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object InterleaveBits {
  def apply(bits: Int, cols: Column*): Column =
    ColumnBridge.column(
      InterleaveBits(cols.map(ColumnBridge.expression), bits))

  def compute(vals: Array[Int], bits: Int): Long = {
    val n = vals.length
    val mask = (1 << bits) - 1
    var out = 0L
    var i = 0
    while (i < bits) {
      var c = 0
      while (c < n) {
        out |= (((vals(c) & mask) >> i) & 1).toLong << (i * n + c)
        c += 1
      }
      i += 1
    }
    out
  }
}
