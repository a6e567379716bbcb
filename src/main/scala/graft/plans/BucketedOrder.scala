package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact global order statistics WITHOUT a single-partition window.
  *
  * `row_number()/sum() OVER (ORDER BY …)` with no partition key is the
  * classic scale trap: Spark plans it as ONE task sorting the whole
  * input (`WindowExec: No Partition Defined`). The results here are
  * EXACT order statistics, so the fix is not an approximation — it is
  * the textbook two-pass decomposition of a prefix scan:
  *
  *   1. range-bucket the leading sort key (arithmetic against its
  *      broadcast min/max — no driver collect, no sampling pass);
  *   2. per-bucket counts/sums (one map-side-combined aggregation),
  *      prefix-summed by a window over the ≤[[DefaultBuckets]]-row
  *      bucket table — the only "global" window runs on data
  *      proportional to the bucket COUNT, not the input;
  *   3. broadcast the bucket offsets back and finish with a window
  *      partitioned BY bucket — every partition sorts in parallel.
  *
  * Correctness needs exactly one property from the bucketing: the
  * bucket id must be WEAKLY MONOTONE in the leading sort key (key a ≤
  * key b ⇒ bucket(a) ≤ bucket(b)). Then (bucket, within-bucket order)
  * is the global total order, and rank/prefix sums decompose as
  * bucket-offset + within-bucket statistic. `floor((k−lo)·B/(hi−lo))`
  * over correctly-rounded double ops is weakly monotone by
  * construction, so the DECOMPOSITION never depends on float niceties
  * — only the (exact) tie-break columns order rows within a bucket.
  *
  * Used by the exact-rank/prefix-sum family: `q_text_pack`,
  * `q_flag_winsor`, `q_flag_qte`, `q_corpus_classifier_eval`,
  * `q_corpus_selection_curve`. Their oracles all state the naive
  * one-partition window, so the parallel decomposition is hash-checked
  * against the sequential definition every round.
  */
object BucketedOrder {

  /** Bucket-table width. 64 keeps the offset window trivially small
    * while giving local[32] full parallelism; at 1000-executor scale
    * size it ~4× the cluster's cores the same way shuffle partitions
    * are sized (the decomposition is correct for ANY width ≥ 1).
    */
  val DefaultBuckets = 64

  /** Append an exact global rank and exact inclusive prefix sums to
    * `df`, equivalent to
    * `row_number()/sum(c) OVER ([PARTITION BY p] ORDER BY order…)`
    * but never planning a single-partition window.
    *
    * @param rangeKey  numeric proxy for the LEADING sort key, ascending-
    *                  aligned with `order` (pass `-score` for a
    *                  descending leading key); only its weak
    *                  monotonicity matters, never its exact value
    * @param order     the full deterministic total order (include
    *                  tie-break columns; `.desc` allowed)
    * @param partitionCols  optional partition keys (e.g. experiment
    *                  arm): statistics restart per partition, exactly
    *                  like `PARTITION BY` — buckets subdivide each
    *                  partition so every arm still sorts in parallel
    * @param cums      outputName → LONG input column to prefix-sum
    *                  (inclusive of the current row)
    * @param rankCol   output name for the 1-based global rank
    */
  def withOrderStats(
      df: DataFrame,
      rangeKey: Column,
      order: Seq[Column],
      partitionCols: Seq[String] = Nil,
      cums: Seq[(String, String)] = Nil,
      rankCol: String = "rk",
      buckets: Int = DefaultBuckets): DataFrame = {
    val keyD = rangeKey.cast("double")
    val mm = df.agg(min(keyD).as("__lo"), max(keyD).as("__hi"))
    // weakly monotone in keyD; the hi==lo degenerate case (all keys
    // equal) puts everything in bucket 0 — still correct, the within-
    // bucket tie-breaks carry the whole order
    val bucketed = df.crossJoin(broadcast(mm))
      .withColumn("__bucket",
        when(col("__hi") <= col("__lo"), lit(0L)).otherwise(
          least(floor((keyD - col("__lo")) * lit(buckets.toDouble) /
            (col("__hi") - col("__lo"))).cast(LongType), lit(buckets - 1L))))
      .drop("__lo", "__hi")
    val pCols = partitionCols.map(col)
    // two-level offsets, one input pass, O(1) agg work per input row:
    // (1) ordinary per-bucket totals (map-side combined); (2) fold the
    // ≤buckets-row bucket table into ONE wide row per partition group
    // via conditional sums — O(buckets²) work total, on dimension-sized
    // data. (A single-level wide aggregate straight off the input costs
    // O(buckets) per ROW — measured 2-2.5× on the order-stat queries;
    // a prefix window over the bucket table would be a partition-less
    // WindowExec, the very shape the registry-wide PlanSpec gate
    // forbids because in a plan it is indistinguishable from the
    // genuine full-input scale trap.)
    val bucketTable = bucketed
      .groupBy((pCols :+ col("__bucket")): _*)
      .agg(count(lit(1)).cast(LongType).as("__cnt"),
        cums.map { case (out, in) =>
          sum(col(in).cast(LongType)).as(s"__bsum_$out")
        }: _*)
    val cntAggs = (0 until buckets).map(k =>
      sum(when(col("__bucket") === k, col("__cnt")).otherwise(0L)).as(s"__c$k"))
    val sumAggs = cums.flatMap { case (out, _) =>
      (0 until buckets).map(k =>
        sum(when(col("__bucket") === k, col(s"__bsum_$out")).otherwise(0L))
          .as(s"__s${out}_$k"))
    }
    val aggExprs = cntAggs ++ sumAggs
    val perPart =
      if (pCols.isEmpty) bucketTable.agg(aggExprs.head, aggExprs.tail: _*)
      else bucketTable.groupBy(pCols: _*).agg(aggExprs.head, aggExprs.tail: _*)
    // exclusive prefixes in-row: bucket k's offset = Σ buckets < k —
    // O(buckets²) long adds on a ≤|partition groups|-row table
    def arrOf(prefix: String): Column =
      array((0 until buckets).map(k => col(s"$prefix$k")): _*)
    def exclusivePrefix(arr: Column, k: Column): Column =
      aggregate(slice(arr, lit(1), k.cast("int")), lit(0L), (acc, x) => acc + x)
    val offsetStructs = transform(sequence(lit(0L), lit(buckets - 1L)), k =>
      struct(
        (k.as("__bucket") +:
          exclusivePrefix(arrOf("__c"), k).as("__prior_cnt") +:
          cums.map { case (out, _) =>
            exclusivePrefix(arrOf(s"__s${out}_"), k).as(s"__prior_$out")
          }): _*))
    val offsets = perPart
      .select((pCols :+ explode(offsetStructs).as("__e")): _*)
      .select((pCols :+ col("__e.__bucket") :+ col("__e.__prior_cnt"))
        ++ cums.map { case (out, _) => col(s"__e.__prior_$out") }: _*)
    val wIn = Window.partitionBy((pCols :+ col("__bucket")): _*).orderBy(order: _*)
    val wInF = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStats = bucketed
      .join(broadcast(offsets), partitionCols :+ "__bucket")
      .withColumn(rankCol, col("__prior_cnt") + row_number().over(wIn).cast(LongType))
    cums.foldLeft(withStats) { case (acc, (out, in)) =>
      acc.withColumn(out, col(s"__prior_$out") + sum(col(in)).over(wInF).cast(LongType))
    }.drop(("__bucket" +: "__prior_cnt" +: cums.map { case (out, _) => s"__prior_$out" }): _*)
  }
}
