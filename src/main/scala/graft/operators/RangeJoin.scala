package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketized) range join: pairs within `width` of each other
  * on a numeric/temporal axis, per key.
  *
  * A plain `a JOIN b ON k AND abs(ta - tb) <= w` theta-join degrades to
  * a per-key cross product in Spark (the range predicate can't drive a
  * hash join). Banding restores an equi-join: bucket both sides by
  * `floor(t / width)`, join each left bucket to its right neighbors
  * {band-1, band, band+1} (any pair within `width` differs by at most
  * one band), then apply the exact range filter to the candidates.
  * Cost is (bucket occupancy)^2 per band — proportional to local
  * density, not key cardinality — and the join is a shuffle-hash/SMJ
  * equi-join on (key, band), which scales like any other equi-join.
  */
object RangeJoin {

  /** Pairs (a, b) sharing `keys` with `|a.leftT - b.rightT| <= width`.
    * Column names of `a` and `b` must be disjoint apart from `keys`
    * (alias upstream if not). `leftT`/`rightT` must be integral
    * (epoch-scaled timestamps work: cast before calling). */
  def banded(a: DataFrame, b: DataFrame, keys: Seq[String],
             leftT: String, rightT: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    // floor-division in pure LONG arithmetic: floor(col/width) through
    // doubles loses precision past 2^53 (epoch nanos), which would place
    // rows two bands apart and silently drop in-window pairs. Subtracting
    // pmod makes the numerator an exact floor multiple, so integer `div`
    // (truncating) equals floor division for negatives too.
    def withBand(df: DataFrame, t: String, bandCol: String): DataFrame =
      df.withColumn("__tl", col(t).cast("long"))
        .withColumn(bandCol,
          expr(s"(__tl - pmod(__tl, ${width}L)) div ${width}L"))
        .drop("__tl")
    val aBand = withBand(a, leftT, "__band")
    val bBand = withBand(b.withColumnRenamed(rightT, "__rt"),
        "__rt", "__rband")
      .withColumn("__band",
        explode(array(col("__rband") - 1, col("__rband"),
          col("__rband") + 1)))
      .drop("__rband")
    val joined = aBand.join(bBand, keys :+ "__band")
      .where(abs(col(leftT) - col("__rt")) <= width)
      .drop("__band")
    // rename the right timestamp back (post-join: names are now unique)
    joined.withColumnRenamed("__rt", rightT + "_right")
  }
}
