package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.InterleaveBits

/** Z-order (Morton) clustering key over N numeric columns.
  *
  * [[withZValue]] appends a sortable code: each column is min-max
  * normalized to a `bits`-bit integer rank (one metadata-scale agg pass
  * for the global min/max), then the ranks are bit-interleaved with the
  * native [[InterleaveBits]] expression. Sorting by the code lays rows
  * along a space-filling curve, so files cut from contiguous code
  * ranges cover small hyper-rectangles of the column space — per-file
  * min/max stats then discriminate on EVERY z-ordered column, which is
  * what turns `MiniDelta.filesForRange` skipping from leading-column-
  * only into multi-dimensional (OPTIMIZE ZORDER's effect).
  *
  * Scale: the min/max agg is one partial-aggregated pass (bytes of
  * driver state); the code itself is a per-row codegen'd expression —
  * no shuffle beyond the rewrite's own repartition. Nulls rank 0
  * (lowest), matching Delta's NULLS FIRST z-order placement.
  */
object ZOrder {

  /** The normalized `bits`-bit rank of `c` given global [lo, hi]. */
  private def rank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val top = (1 << bits) - 1
    val r =
      if (hi <= lo) lit(0) // constant column: every row ranks equal
      else least(lit(top), greatest(lit(0),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top))
          .cast("int")))
    coalesce(r, lit(0)) // nulls first, like Delta ZORDER
  }

  /** `df` plus a z-value column `out` interleaving `cols`. `bits = 0`
    * (the default) auto-sizes to the widest rank that fits a signed
    * long — 16 bits up to 3 columns, 63/n beyond — so z-ordering 4+
    * columns (routine for OPTIMIZE ZORDER) works out of the box. */
  def withZValue(df: DataFrame, cols: Seq[String], out: String = "__z",
                 bits: Int = 0): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    // withColumn would silently REPLACE (and the caller later drop) a
    // pre-existing user column of the temp name
    require(!df.columns.contains(out),
      s"z-value column name '$out' collides with an existing column")
    val bits0 = if (bits > 0) bits else math.min(16, 63 / cols.size)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def d(name: String): Double =
      if (row.isNullAt(row.fieldIndex(name))) 0.0
      else row.getDouble(row.fieldIndex(name))
    val ranks = cols.map(c => rank(col(c), d(s"lo_$c"), d(s"hi_$c"), bits0))
    df.withColumn(out, InterleaveBits(bits0, ranks: _*))
  }

  /** The interleave as a pure Spark-SQL shift-or fold — the documented
    * composition [[InterleaveBits]] must equal bit for bit (parity
    * spec). Interpreted per bit*column; the native form is one pass. */
  def interleaveComposed(bits: Int, cols: Column*): Column = {
    val n = cols.size
    val mask = (1 << bits) - 1
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, ci) =>
        shiftleft(
          shiftright(c.bitwiseAND(lit(mask)), i).bitwiseAND(lit(1))
            .cast("long"),
          i * n + ci)
      }
    }.reduce(_.bitwiseOR(_))
  }
}
