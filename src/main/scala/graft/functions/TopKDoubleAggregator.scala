package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** [[TopKAggregator]]'s (Double, Long)-keyed sibling — exact bounded
  * per-group top-k for DOUBLE sort keys (per-query score shortlists),
  * with the identical plan rationale: a rank window shuffles and sorts
  * every scored row of every group (N·|queries| rows for an
  * all-candidates coarse pass — the q_sim_project_search sf10 OOM),
  * while this aggregate carries at most k rows per (input partition,
  * group) through the map-side partial and O(k) state per group on the
  * reduce side.
  *
  * Ordering: min-k by `(key, id)` under
  * `Ordering.Double.TotalOrdering` — the SAME total order Spark's
  * window `ORDER BY key ASC` uses (−0.0 < 0.0, NaN greatest), so a
  * caller that negates a score (`key = −score`, NaN mapped to −∞ by
  * the caller) reproduces `ORDER BY score DESC, id ASC` bit-exactly on
  * every value a well-defined score can take.
  *
  * Exactness (same argument as [[TopKAggregator]]): min-k of a union
  * is the min-k of the unions' min-k's, so partial buffers only ever
  * drop rows that cannot be in the global answer.
  */
final class TopKDoubleAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  override def zero: Seq[(Double, Long)] = Vector.empty

  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] = {
    // skip rows that can't enter a full buffer (the hot path at scale)
    if (buf.length == k && ord.lteq(buf.last, row)) buf
    else {
      // O(k) sorted insertion (the buffer is always sorted)
      val i = buf.indexWhere(ord.gt(_, row)) match {
        case -1 => buf.length
        case idx => idx
      }
      val inserted = (buf.take(i) :+ row) ++ buf.drop(i)
      if (inserted.length <= k) inserted else inserted.take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // linear two-pointer merge of two sorted buffers, capped at k
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0
    var j = 0
    var n = 0
    val cap = math.min(k, a.length + b.length)
    while (n < cap) {
      if (j >= b.length || (i < a.length && ord.lteq(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
