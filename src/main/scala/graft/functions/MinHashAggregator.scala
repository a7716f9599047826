package graft.functions

import graft.operators.Dedup
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2 B19): MinHash signature as a custom Aggregator.
  *
  * Input: a token/shingle id. Buffer: the running per-permutation minima.
  * Merge is element-wise min — associative and commutative, so Catalyst
  * plans it with map-side partial aggregation; the shuffle carries one
  * k-long array per group, never the tokens. This is the
  * `TypedImperativeAggregate`-style alternative to expressing the
  * signature as k `min()` columns (same results, one aggregate instead
  * of k — the shape a 100 TB dedup pass wants).
  *
  * Register with `spark.udf.register("minhash_sig", functions.udaf(new
  * MinHashAggregator(k)))` for SQL use.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val params = Dedup.hashParams(numHashes)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], tid: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val (a, b) = params(i)
      val h = (tid * a + b) % Dedup.P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    buf.toSeq.map(v => if (v == Long.MaxValue) -1L else v)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
