package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count of common elements between two SORTED, DISTINCT arrays of
  * strings or longs.
  *
  * Native Catalyst expression with whole-stage codegen: a zero-allocation
  * O(n+m) merge scan, replacing `size(array_intersect(a, b))` (which
  * builds a hash set per evaluated row) in set-similarity hot paths like
  * n-gram Jaccard. The long specialization runs entirely on primitives —
  * no per-element object allocation at all. Inputs MUST be sorted
  * ascending and duplicate-free (e.g. via `array_sort(array_distinct(
  * ...))`) — unsorted input gives an undercount, it does not error.
  *
  * Null elements (array_sort places them last) follow `array_intersect`
  * semantics: a null element present in BOTH arrays counts as one common
  * element; a null on one side only does not match anything.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"sorted_intersect_count expects arrays, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires two array<string> or two " +
            s"array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    val n = a.numElements()
    val m = b.numElements()
    // nulls are sorted last: once either cursor hits one, no non-null
    // match remains; a null on both sides counts once (array_intersect).
    if (elemType == LongType) {
      while (i < n && j < m && !a.isNullAt(i) && !b.isNullAt(j)) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m && !a.isNullAt(i) && !b.isNullAt(j)) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    if (n > 0 && m > 0 && a.isNullAt(n - 1) && b.isNullAt(m - 1)) c += 1
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val body = if (elemType == LongType) {
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
           |  else if ($cmp < 0) { $i++; } else { $j++; }
         """.stripMargin
      }
      s"""
         |${ev.value} = 0L;
         |int $i = 0;
         |int $j = 0;
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |while ($i < $n && $j < $m
         |       && !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |$body
         |}
         |if ($n > 0 && $m > 0
         |    && $a.isNullAt($n - 1) && $b.isNullAt($m - 1)) {
         |  ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column API: both arrays must be sorted + distinct, both
    * array<string> or both array<bigint>. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
