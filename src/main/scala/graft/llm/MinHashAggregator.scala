package graft.llm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.8): folds a document's
  * shingles into a fixed-width vector of 64-bit minima, one per seeded
  * hash function.
  *
  * This is the `Aggregator[IN, BUF, OUT]` form of
  * [[Dedup.minhashSignatures]] — same algorithm family (seeded hash,
  * per-seed minimum; merge = element-wise min, so the aggregation is
  * associative/commutative and parallelizes with map-side partials). The
  * expression-based form stays the engine default (codegen'd, oracle-
  * portable md5); this typed form is the API for Dataset pipelines and
  * for sketch types Spark's built-ins can't express.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  // FNV-1a over the shingle bytes, then xor-folded with a per-slot seed
  // mix (splitmix64) — deterministic, allocation-free.
  private def hash(s: String, seed: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    var z = h + 0x9e3779b97f4a7c15L * (seed + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      val h = hash(shingle, j)
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** Estimated Jaccard similarity from two signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.indices.count(i => a(i) == b(i)).toDouble / a.length
  }
}
