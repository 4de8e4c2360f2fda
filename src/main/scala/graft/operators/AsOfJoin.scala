package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: enrich each left row with the most
  * recent right row at or before its timestamp, per key — the canonical
  * operator for leak-free feature generation (label rows must only see
  * features known at label time) and for trade/quote alignment in the
  * reference's market-data domain.
  *
  * Spark has no ASOF JOIN; the naive formulations are a range
  * self-join (quadratic per key) or a per-key loop (driver-bound).
  * The scalable form used here is union + one partitioned window:
  * tag both sides, union them, and take
  * `last(rightValue, ignoreNulls).over(partitionBy(keys)
  * .orderBy(ts, side, id).rowsBetween(unboundedPreceding, current))`
  * — ONE shuffle on the key, linear scan per key, no pair blowup.
  * Right rows sort before left rows at an equal timestamp (side 0 < 1),
  * giving `rightTs <= leftTs` inclusive semantics; `idCol` breaks
  * timestamp ties deterministically.
  *
  * At 100 TB both sides shuffle once by key and stream through a sort —
  * the same shape as a sort-merge join, with skew governed by the
  * hottest key's row count (salt keys or bucket time if one key
  * dominates).
  */
object AsOfJoin {

  /** Enrich `left` with `prefix`-named columns holding the latest
    * `rightVals` values from `right` where `right.tsCol <= left.tsCol`,
    * matching on `keys`. Left rows with no prior right row get nulls.
    * Both inputs must contain `keys`, `tsCol`, and `idCol`; `rightVals`
    * name the right's columns to carry (they must not collide with
    * left's columns after prefixing). */
  def lastPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
                tsCol: String, idCol: String, rightVals: Seq[String],
                prefix: String = "asof_"): DataFrame = {
    val rightTypes = rightVals.map(v =>
      v -> right.schema(right.schema.fieldIndex(v)).dataType)
    // left side: null placeholders typed from the right schema
    val lTagged = left
      .select((left.columns.map(col) :+ lit(1).as("__side")) ++
        rightTypes.map { case (v, t) =>
          lit(null).cast(t).as(s"__r_$v")
        }: _*)
    // right side: only keys + ordering + carried values; left-only
    // columns become typed nulls so unionByName lines up
    val lOnly = left.columns.filterNot(c =>
      keys.contains(c) || c == tsCol || c == idCol)
    val rTagged = right
      .select((keys :+ tsCol :+ idCol).map(col) ++
        Seq(lit(0).as("__side")) ++
        rightTypes.map { case (v, _) => col(v).as(s"__r_$v") } ++
        lOnly.map(c => lit(null).cast(
          left.schema(left.schema.fieldIndex(c)).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(col("*") +: rightTypes.map { case (v, _) =>
        last(col(s"__r_$v"), ignoreNulls = true).over(w)
          .as(s"$prefix$v")
      }: _*)
      .where(col("__side") === 1)
      .drop("__side")
      .drop(rightVals.map(v => s"__r_$v"): _*)
  }
}
