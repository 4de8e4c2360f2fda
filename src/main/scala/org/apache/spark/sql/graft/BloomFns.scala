package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers for Spark's runtime bloom-filter expressions, which
  * power its own runtime-filter join optimization but are not exposed in
  * the public function registry. The sketch is merged with bitwise OR,
  * so the build is order-independent (deterministic across
  * partitionings); probes are codegen'd.
  *
  * Inputs must already be xxhash64-hashed longs (the same contract the
  * internal `bloom_filter_agg` has). */
object BloomFns {

  /** Aggregate `hashed` (xxhash64 longs) into one serialized bloom
    * sketch sized for `items` expected entries over `bits` bits. */
  def bloomAgg(hashed: Column, items: Long, bits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashed),
        Literal(items), Literal(bits)).toAggregateExpression())

  /** True when `hashed` may be in the sketch `bloomDF` computes (a
    * one-row, one-binary-column aggregate); false is exact. The sketch
    * rides as a SCALAR SUBQUERY — `might_contain` requires its filter
    * side to be constant-foldable, which is exactly how Spark's own
    * InjectRuntimeFilter wires it. */
  def mightContain(bloomDF: DataFrame, hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDF.queryExecution.analyzed),
      ColumnBridge.expression(hashed)))
}
