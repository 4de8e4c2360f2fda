package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group — the grouped form of TakeOrderedAndProject.
  *
  * Expressed as a `row_number` rank filter over a partitioned window so
  * Catalyst's InferWindowGroupLimit (Spark 3.5+) rewrites it into
  * WindowGroupLimitExec: each task keeps a bounded k-buffer per group
  * BEFORE the window sort, both map-side (partial) and after the one
  * group-key shuffle (final), instead of fully sorting every group. At
  * 100 TB that is the difference between "k rows per group cross the
  * exchange" and "the whole table gets window-sorted".
  *
  * The order must be total (include a tiebreak column) for the ranks to
  * be deterministic across engines and runs.
  */
object TopKPerGroup {

  def apply(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
            k: Int, rankCol: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' collides with an existing column")
    val w = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .where(col(rankCol) <= k)
  }
}
