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
  *
  * DISTRIBUTION PREMISE — equal-width buckets bound parallelism only
  * while no single key VALUE holds a large fraction of the input. A
  * heavy mode (e.g. zero-inflated spend: 50% of users at y=0) lands in
  * one bucket by necessity — ties must share a bucket because ranks
  * among ties are decided by the tie-break columns, which do not
  * participate in bucketing — so that bucket's window sorts the mode
  * in one task, and the plan HAS a partition spec, so the registry
  * PlanSpec gate cannot see it. Remedies when a caller's key is modal
  * at scale: handle the mode out-of-band (a rank among identical keys
  * is arbitrary up to the tie-break — e.g. winsor's cap only needs the
  * rank-r order statistic, and a mode straddling r can be resolved
  * with one count), or pre-aggregate to distinct keys first (the
  * `classifierEval` perScore shape). The current call sites' leading
  * keys (doc_id, per-user spend sums, float scores) are
  * high-cardinality at the tested scales; this premise is the
  * documented contract for new callers.
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
    *
    * CACHE LIFECYCLE: this method persists `df` (MEMORY_AND_DISK) and
    * never unpersists it — the returned plan reads the cache lazily, so
    * an eager unpersist here would defeat the reuse. The CALLER's
    * harness owns reclamation: the Bench/Verify loops call
    * `Tables.releaseCaches(spark)` after every query (the engine-wide
    * persist convention). A long-lived session embedding this operator
    * outside those harnesses must do the same or it accumulates one
    * cache entry per call. Persisting an already-cached frame is a
    * CacheManager no-op, so callers that persist their own input
    * (q_prod_range_join) are unaffected.
    */
  def withOrderStats(
      df: DataFrame,
      rangeKey: Column,
      order: Seq[Column],
      partitionCols: Seq[String] = Nil,
      cums: Seq[(String, String)] = Nil,
      rankCol: String = "rk",
      buckets: Int = DefaultBuckets): DataFrame = {
    // The decomposition reads `df` THREE times (the min/max range
    // aggregate, the per-bucket totals, and the final offsets join) —
    // persist it so the input subtree computes once instead of three
    // times (r17; q_sim_outliers fed the N·c nearest-centroid argmin in
    // here and paid it 3×). MEMORY_AND_DISK, reclaimed by the harness's
    // Tables.releaseCaches; persisting an already-cached frame is a
    // CacheManager no-op, so callers that persist their own input
    // (q_prod_range_join) are unaffected.
    val dfc = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyD = rangeKey.cast("double")
    // NaN keys are excluded from the range (Spark's min/max treat NaN as
    // the LARGEST double, so one NaN key would poison __hi → every row's
    // bucket arithmetic NaN → null → all rows silently dropped by the
    // offsets equi-join) and mapped to a sentinel bucket `buckets` that
    // sorts AFTER every real bucket — matching Spark's NaN-last
    // ascending window order. A DESC caller (negated rangeKey) whose
    // keys can be NaN must handle NaN itself (−NaN is still NaN, but
    // `.desc` orders NaN first while the sentinel sorts last) — the same
    // caveat class as the null/desc_nulls_first note below.
    val keyFinite = when(isnan(keyD), lit(null)).otherwise(keyD)
    val mm = dfc.agg(min(keyFinite).as("__lo"), max(keyFinite).as("__hi"))
    // weakly monotone in keyD; the hi==lo degenerate case (all keys
    // equal) puts everything in bucket 0 — still correct, the within-
    // bucket tie-breaks carry the whole order. NULL range keys go to
    // bucket −1 (min/max ignore nulls, so they'd otherwise get a null
    // bucket: silently dropped by the offsets equi-join AND counted
    // into every real bucket's offset — rows missing, all ranks wrong).
    // −1 sorts before every real bucket, matching ASC NULLS FIRST; a
    // DESC caller (negated rangeKey) whose keys can be null must flip
    // to `desc_nulls_first` in `order` to stay consistent.
    val bucketed = dfc.crossJoin(broadcast(mm))
      .withColumn("__bucket",
        when(keyD.isNull, lit(-1L))
          .when(isnan(keyD), lit(buckets.toLong))
          .when(col("__hi").isNull || col("__hi") <= col("__lo"), lit(0L))
          .otherwise(
            least(floor((keyD - col("__lo")) * lit(buckets.toDouble) /
              (col("__hi") - col("__lo"))).cast(LongType), lit(buckets - 1L))))
      .drop("__lo", "__hi")
    val pCols = partitionCols.map(col)
    // two-level offsets, one input pass, O(1) agg work per input row:
    // (1) ordinary per-bucket totals (map-side combined); (2) gather
    // the ≤buckets-row bucket table into ONE sorted array row per
    // partition group and take exclusive prefixes with interpreted
    // array HOFs — O(nonempty²) adds on dimension-sized data, and
    // crucially a COMPACT expression tree. (A buckets-wide conditional-
    // sum pivot here generates hundreds of aggregate expressions whose
    // codegen compile time alone dominated these sub-second queries; a
    // prefix window over the bucket table would be a partition-less
    // WindowExec, the very shape the registry-wide PlanSpec gate
    // forbids because in a plan it is indistinguishable from the
    // genuine full-input scale trap.)
    val bucketTable = bucketed
      .groupBy((pCols :+ col("__bucket")): _*)
      .agg(count(lit(1)).cast(LongType).as("__cnt"),
        cums.map { case (out, in) =>
          sum(col(in).cast(LongType)).as(s"__bsum_$out")
        }: _*)
    val gathered = array_sort(collect_list(struct(
      (col("__bucket") +: col("__cnt") +:
        cums.map { case (out, _) => col(s"__bsum_$out") }): _*))).as("__bt")
    val perPart =
      if (pCols.isEmpty) bucketTable.agg(gathered)
      else bucketTable.groupBy(pCols: _*).agg(gathered)
    // element i's exclusive prefix = fold of the first i array elements
    def prior(i: Column, field: String): Column =
      aggregate(slice(col("__bt"), lit(1), i), lit(0L),
        (acc, x) => acc + x.getField(field))
    val offsetStructs = transform(col("__bt"), (e, i) =>
      struct(
        (e.getField("__bucket").as("__bucket") +:
          prior(i, "__cnt").as("__prior_cnt") +:
          cums.map { case (out, _) =>
            prior(i, s"__bsum_$out").as(s"__prior_$out")
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
