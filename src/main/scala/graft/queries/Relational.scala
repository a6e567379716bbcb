package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import Det._

/** The declared relational analytics surface (SURVEY.md §2.B).
  *
  * Everything here is a composition of Spark built-ins — Catalyst gets
  * predicate pushdown, column pruning, partial aggregation, broadcast
  * selection and whole-stage codegen for free. Each builder is paired
  * with DuckDB oracle SQL in [[Relational.all]]; column names/aliases are
  * kept identical on both sides (driver hash-compares after sorting by
  * column name).
  *
  * Scale notes (100 TB): every aggregation below is a partial+final hash
  * aggregate (map-side combine before the shuffle); joins against the
  * small dimensions (region/nation/customer/part) are broadcast — no
  * shuffle of the fact table; top-k queries plan as
  * TakeOrderedAndProject (per-partition heap, no global sort).
  */
object Relational {

  // ---------------------------------------------------------------- scans

  /** Q-SCAN-1: full-scan count of the events stream table. */
  def scanCount(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).agg(count(lit(1)).as("n"))

  /** Q-SCAN-2: row count of every table (scan each source once). */
  def scanTables(s: SparkSession, d: String): DataFrame =
    Tables.names
      .map(n => Tables.t(s, d, n).agg(count(lit(1)).as("n")).select(lit(n).as("table_name"), col("n")))
      .reduce(_ unionAll _)

  /** Q-SCAN-3: ANALYZE-style column statistics — the stats a
    * cost-based optimizer (or a data catalog) collects per column:
    * row count, null count, exact NDV with an HLL++ accuracy gate
    * (the estimate itself stays engine-specific and is emitted only as
    * the in-row `est_within_5pct` boolean — the q_agg_approx pattern),
    * and min/max rendered through type-pinned casts (numerics via
    * decimal, dates via date) so both engines print identical strings.
    *
    * One row per profiled column, all from ONE scan: the stats fold in
    * a single aggregate (multiple exact distincts plan as one Expand —
    * at 100 TB you drop the exact NDVs and keep only the HLL sketches,
    * same plan minus the expand; the gate column is exactly the audit
    * that justifies that swap), then unpivot to the per-column layout.
    */
  def scanColStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val dec2 = org.apache.spark.sql.types.DecimalType(14, 2)
    // typed views: min/max compare in the NATIVE order (numeric/date),
    // then render to string — never lexicographic over digit strings
    def typed(name: String): org.apache.spark.sql.Column = name match {
      case "l_quantity" => col(name).cast(dec2)
      case "l_shipdate" => col(name).cast("date")
      case n => col(n)
    }
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    // pass 1: count/nulls/min/max/HLL — a plain Hash/ObjectHashAggregate
    // (NO exact distincts here: mixing multiple DISTINCT aggregates with
    // sketch buffers rewrites into an Expand + SortAggregate that sorts
    // a 4x-expanded input while merging 16 KB HLL buffers — measured
    // ~40 s/run at sf0.1 vs ~1 s for this split)
    val aggs = cols.flatMap { n =>
      Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"nn_$n"),
        approx_count_distinct(col(n), 0.05).as(s"ap_$n"),
        min(typed(n)).cast("string").as(s"mn_$n"),
        max(typed(n)).cast("string").as(s"mx_$n"))
    }
    val one = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    // pass 2: exact NDVs as ONE compact (col_idx, value) pair shuffle —
    // map-side combine shrinks to the distinct dimension; this is the
    // shape that survives 100 TB (the sketch gate in pass 1 is the
    // audit that justifies dropping this pass at extreme scale)
    val pairs = li.select(posexplode(
      array(cols.map(n => col(n).cast("string")): _*)).as(Seq("idx", "v")))
    val ndv = pairs.filter(col("v").isNotNull)
      .select(col("idx"), col("v")).distinct()
      .groupBy(col("idx")).agg(count(lit(1)).as("ndv"))
    val rows = array(cols.zipWithIndex.map { case (n, i) =>
      struct(
        lit(i).as("idx"), lit(n).as("col_name"),
        col("n_rows"), col(s"nn_$n").as("n_nulls"),
        col(s"ap_$n").as("ap"),
        col(s"mn_$n").as("min_s"), col(s"mx_$n").as("max_s"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*"))
      .join(broadcast(ndv), Seq("idx"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        // 3-sigma bound for the rsd=0.05 sketch (+16 small-count floor):
        // deterministic given the data, loose enough to hold at any sf
        (abs(col("ap") - col("ndv")) <= col("ndv") * lit(0.15) + lit(16L))
          .as("est_ok"),
        col("min_s"), col("max_s"))
  }

  val scanColStatsSql: String = {
    def one(name: String, mm: String) =
      s"""SELECT '$name' AS col_name, count(*)::BIGINT AS n_rows,
         |  sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         |  count(DISTINCT $name)::BIGINT AS ndv,
         |  TRUE AS est_ok,
         |  min($mm)::VARCHAR AS min_s, max($mm)::VARCHAR AS max_s
         |FROM lineitem""".stripMargin
    Seq(
      one("l_orderkey", "l_orderkey"),
      one("l_quantity", "l_quantity::DECIMAL(14,2)"),
      one("l_returnflag", "l_returnflag"),
      one("l_shipdate", "l_shipdate::DATE")).mkString("\nUNION ALL\n")
  }

  // ------------------------------------------------------- filter/project

  /** Q-FILT-1: purchase events in the first week; pushed-down predicate +
    * pruned projection (only 4 of 6 columns reach the scan).
    */
  def filtEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase" && col("ts") < to_timestamp(lit("2024-01-08 00:00:00")))
      .select(col("event_id"), col("user_id"), col("value"), tsUs(col("ts")).as("ts_us"))

  /** Q-FILT-2: lineitem shipped in 1996 with arithmetic projection
    * `l_extendedprice * (1 - l_discount)` in exact decimals.
    */
  def filtLineitem(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") <  to_timestamp(lit("1997-01-01 00:00:00")))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (dec(col("l_extendedprice"), 14, 2) * (lit(1) - dec(col("l_discount"), 14, 2)))
          .cast(DoubleType).as("revenue"))

  // ----------------------------------------------------------------- joins

  /** Q-JOIN-1: multi-way equi join orders⋈customer⋈nation⋈region with a
    * per-(region, nation) revenue rollup. region/nation/customer are
    * dimension-sized → Catalyst broadcasts them; only orders shuffles
    * (for the final group-by), and AQE coalesces the post-shuffle
    * partitions.
    */
  def joinMulti(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice"), 18, 2).as("revenue"))

  /** Q-JOIN-2: enrichment join — events stream ⋈ customer dimension,
    * explicitly broadcast (the person/dimension-enrichment pattern: at
    * 100 TB the fact side never shuffles for this join).
    */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), sumd(col("value"), 14, 2).as("sum_value"))

  /** Q-JOIN-3: customers with at least one order (left-semi: no
    * duplication, no payload columns from the build side).
    */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Q-JOIN-4: customers with no orders (left-anti). */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  /** Q-JOIN-5: as-of join — each purchase matched to the latest
    * signup at-or-before it for the same user. Implemented the
    * Spark-native way: ONE pass over the unioned stream with a running
    * `last(ignoreNulls)` window — a single shuffle on user_id, no
    * self-join, no N² range-join blowup. This is the pattern that holds
    * at 100 TB (shuffle ∝ data size, state ∝ 1 row per key).
    */
  def joinAsOf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"))
      .withColumn("asof_ts", last("sig_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
              tsUs(col("asof_ts")).as("asof_signup_us"))
  }

  /** Q-JOIN-5b: FORWARD as-of join — each purchase matched to the
    * EARLIEST error strictly after it for the same user (time-to-next-
    * failure attribution; pandas `merge_asof(direction='forward')`,
    * kdb `aj` reversed). Same single-shuffle discipline as [[joinAsOf]]
    * with the mirrored frame: `first(ignoreNulls)` over
    * (currentRow+1, unboundedFollowing).
    */
  def joinAsOfFwd(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    e.select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "error", col("ts")).as("err_ts"))
      .withColumn("next_ts", first("err_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
        tsUs(col("next_ts")).as("next_error_us"))
  }

  /** Max staleness for the tolerance as-of join: 24 hours in micros. */
  val AsOfToleranceUs: Long = 86400000000L

  /** Q-JOIN-5c: as-of join WITH a staleness tolerance — the
    * feature-store / pandas `merge_asof(tolerance=...)` variant: each
    * purchase takes the most recent signup at-or-before it, but a match
    * older than [[AsOfToleranceUs]] is DISCARDED (a feature that stale
    * is worse than no feature — the label-leakage-safe point-in-time
    * join's freshness guard). Emits both the raw staleness (`lag_us`,
    * null when the user never signed up before) and the
    * tolerance-gated match, so no-match and stale-match stay
    * distinguishable.
    *
    * Same single-shuffle discipline as [[joinAsOf]]: one user-keyed
    * window, the tolerance applied as a post-window column — never a
    * range join.
    */
  def joinAsOfTol(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"))
      .withColumn("asof_ts", last("sig_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("lag_us", tsUs(col("ts")) - tsUs(col("asof_ts")))
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
        col("lag_us"),
        when(col("lag_us") <= AsOfToleranceUs, tsUs(col("asof_ts")))
          .as("asof_signup_in_tol_us"))
  }

  /** Q-JOIN-5d: NEAREST as-of join — each purchase matched to the
    * temporally CLOSEST signup in either direction (pandas
    * `merge_asof(direction='nearest')`): the backward at-or-before
    * candidate and the forward strictly-after candidate race on
    * absolute time distance, ties to backward (the pandas rule). Both
    * candidates come from the SAME interleaved user-keyed pass —
    * backward is a running `last(ignoreNulls)`, forward a mirrored
    * `first(ignoreNulls)` — so the cost is one shuffle and two frames
    * over one sort, not two joins. Emits the winner and its direction
    * so downstream can audit the tie/one-sided cases.
    */
  def joinAsOfNearest(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(1, Window.unboundedFollowing)
    val base = e.select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup", col("ts")).as("sig_ts"))
      .withColumn("back_ts", last("sig_ts", ignoreNulls = true).over(wb))
      .withColumn("fwd_ts", first("sig_ts", ignoreNulls = true).over(wf))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
        tsUs(col("back_ts")).as("back_us"), tsUs(col("fwd_ts")).as("fwd_us"))
    val backWins = col("fwd_us").isNull ||
      (col("back_us").isNotNull &&
        (col("ts_us") - col("back_us")) <= (col("fwd_us") - col("ts_us")))
    base.select(col("event_id"), col("user_id"), col("ts_us"),
      when(col("back_us").isNull && col("fwd_us").isNull, lit(null))
        .when(backWins, col("back_us")).otherwise(col("fwd_us"))
        .as("nearest_signup_us"),
      when(col("back_us").isNull && col("fwd_us").isNull, lit(null))
        .when(backWins, lit("backward")).otherwise(lit("forward"))
        .as("direction"))
  }

  val joinAsOfNearestSql: String =
    """WITH base AS (
      |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
      |    (SELECT epoch_us(max(s.ts)) FROM events s
      |      WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |        AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))) AS back_us,
      |    (SELECT epoch_us(min(s.ts)) FROM events s
      |      WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |        AND (s.ts > e.ts OR (s.ts = e.ts AND s.event_id > e.event_id))) AS fwd_us
      |  FROM events e WHERE e.event_type = 'purchase')
      |SELECT event_id, user_id, ts_us,
      |  CASE WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
      |       WHEN fwd_us IS NULL OR (back_us IS NOT NULL
      |            AND (ts_us - back_us) <= (fwd_us - ts_us)) THEN back_us
      |       ELSE fwd_us END AS nearest_signup_us,
      |  CASE WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
      |       WHEN fwd_us IS NULL OR (back_us IS NOT NULL
      |            AND (ts_us - back_us) <= (fwd_us - ts_us)) THEN 'backward'
      |       ELSE 'forward' END AS direction
      |FROM base""".stripMargin

  // ----------------------------------------------------------- aggregation

  /** Q-AGG-1: events per type per day — count/sum/avg/min/max. Exact
    * decimal folds (order-independent → identical on any partitioning).
    */
  def aggDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sumd(col("value")).as("sum_value"),
        avgd(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Q-AGG-2: TPC-H Q1 pricing summary on lineitem. */
  def aggQ1(s: SparkSession, d: String): DataFrame = {
    val ext  = dec(col("l_extendedprice"), 14, 2)
    val disc = dec(col("l_discount"), 14, 2)
    val tax  = dec(col("l_tax"), 14, 2)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"), 14, 2)).cast(DoubleType).as("sum_qty"),
        sum(ext).cast(DoubleType).as("sum_base_price"),
        sum(ext * (lit(1) - disc)).cast(DoubleType).as("sum_disc_price"),
        sum(ext * (lit(1) - disc) * (lit(1) + tax)).cast(DoubleType).as("sum_charge"),
        (sum(dec(col("l_quantity"), 14, 2)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(ext).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(disc).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Q-AGG-3: exact distinct users per day (expands to a two-phase
    * distinct aggregate under AQE — no driver-side distinct).
    */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))

  /** Q-AGG-4: approximate distinct (HyperLogLog++) per event type —
    * bench/scale path for cardinality at 100 TB. The raw HLL estimate
    * is engine-specific, so DuckDB can't hash-match it directly;
    * instead the estimate rides NEXT TO its exact `countDistinct` twin
    * and the accuracy gate is computed IN-ROW (|est−exact| ≤ 5%·exact
    * = 5×rsd — loose enough to never flake, tight enough that an
    * off-by-10% estimator fails). Every output column is then
    * deterministic: the exact column hash-matches the oracle and the
    * boolean bounds the estimator, making this a full driver-checked
    * row instead of a rows-only record.
    */
  def aggApprox(s: SparkSession, d: String): DataFrame =
    // Dedup (event_type, user_id) FIRST, then run BOTH aggregates over
    // the distinct pairs: `count(*)` over distinct pairs IS
    // `count(DISTINCT user_id)` per type, and the HLL++ sketch is
    // duplicate-idempotent (register[idx] = max(rho) — re-inserting a
    // value re-derives the same (idx, rho)), so `approx_count_distinct`
    // over the deduped pairs is BIT-IDENTICAL to the estimate over the
    // raw rows. The naive mixed distinct+approx aggregate planned the
    // partial HLL KEYED BY (event_type, user_id): 1,639 sketch-word
    // columns (~13 KB of buffer at rsd=0.01) per DISTINCT PAIR held
    // hash-resident and shuffled, and a 1,641-column codegen unit —
    // measured 2.6 s fastest-pass at sf0.1 and O(|pairs|·13 KB) memory
    // at scale. Deduped-first, sketch state exists only for the
    // |event_type| final groups (plan: 1,641-wide Exchange → 2-column
    // Exchange; see plans/r18/q_agg_approx_{before,after}.txt).
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("est_within_5pct"))

  /** Q-AGG-7: explicit GROUPING SETS through the SQL entry point (the
    * engine's spark.sql surface — temp view + ANSI SQL text).
    */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events_v
        |GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())""".stripMargin)
  }

  /** Q-AGG-5: rollup(event_type, day). */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .rollup(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))

  /** Q-AGG-6: cube(mktsegment, nation) over order totals. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sumd(col("o_totalprice"), 18, 2).as("revenue"))

  /** Q-AGG-8: skew-safe two-phase aggregation — explicit salting. A hot
    * grouping key (one event_type carrying most rows) funnels its whole
    * partition through one reducer; salting splits each key into 16
    * shards for the partial aggregate, then a second (tiny) aggregate
    * merges shards. Exact decimal folds ⇒ bit-identical to the plain
    * single-phase oracle on any shard count. (AQE's skewJoin handles
    * the join-side analogue automatically; this is the groupBy-side
    * pattern you reach for at 100 TB when one tenant is 30% of rows.)
    */
  def aggSalted(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), pmod(hash(col("event_id")), lit(16)).as("__salt"))
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast(DoubleType).as("sum_value"))

  val aggSaltedSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Q-AGG-14: shuffle-skew audit — the measurement that tells you WHEN
    * to reach for [[aggSalted]]'s pattern (or a broadcast): per grouping
    * key, the group-size distribution as EXACT order statistics
    * (max / p99 / p50 via ceil-rank), the hot key's row share, and an
    * integer-exact salting verdict (`max_size · 20 > n_rows` — the hot
    * key above 5% of the table). Audited keys: `user_id` (the genuine
    * partitioning question) and `event_type` (a V=5 key, skewed by
    * construction — the broadcast-not-salt case).
    *
    * Shape at 100 TB: the key-size rollup is one map-side-combined
    * aggregate; the order stats run through [[graft.plans.BucketedOrder]]
    * (key count grows with the data — a partition-less window here would
    * be exactly the single-task sort this audit exists to prevent); the
    * pivot touches 2 rank-selected rows per key.
    */
  def skewAudit(s: SparkSession, d: String): DataFrame = {
    def audit(keyName: String, key: org.apache.spark.sql.Column): DataFrame = {
      // persisted: the key-size dimension feeds the range probe, the
      // rank pass, and the totals aggregate (no static exchange reuse)
      val sizes = Tables.events(s, d)
        .groupBy(key.as("k")).agg(count(lit(1)).as("sz"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranked = graft.plans.BucketedOrder.withOrderStats(
        sizes, col("sz"), Seq(col("sz"), col("k")), rankCol = "rk")
      val tot = sizes.agg(count(lit(1)).as("nk"),
        sum(col("sz")).as("nr"), max(col("sz")).as("mx"))
      ranked.crossJoin(broadcast(tot))
        .filter(col("rk") === expr("(nk * 50 + 99) div 100") ||
          col("rk") === expr("(nk * 99 + 99) div 100"))
        .groupBy()
        .agg(
          first(col("nk")).as("n_keys"),
          first(col("nr")).as("n_rows"),
          first(col("mx")).as("max_size"),
          min(when(col("rk") === expr("(nk * 50 + 99) div 100"), col("sz")))
            .as("p50_size"),
          min(when(col("rk") === expr("(nk * 99 + 99) div 100"), col("sz")))
            .as("p99_size"))
        .select(lit(keyName).as("key"), col("n_keys"), col("n_rows"),
          col("max_size"), col("p50_size"), col("p99_size"),
          (col("max_size").cast(DoubleType) / col("n_rows")).as("top_share"),
          (col("max_size") * 20 > col("n_rows")).as("needs_salt"))
    }
    audit("user_id", col("user_id"))
      .unionByName(audit("event_type", col("event_type")))
  }

  private def skewAuditKeySql(keyName: String): String =
    s"""SELECT '$keyName' AS key, t.nk AS n_keys, t.nr AS n_rows,
       |  t.mx AS max_size, p.p50_size, p.p99_size,
       |  t.mx::DOUBLE / t.nr AS top_share,
       |  t.mx * 20 > t.nr AS needs_salt
       |FROM (
       |  SELECT count(*)::BIGINT AS nk, sum(sz)::BIGINT AS nr, max(sz)::BIGINT AS mx
       |  FROM (SELECT count(*)::BIGINT AS sz FROM events GROUP BY $keyName)) t, (
       |  SELECT
       |    min(CASE WHEN rk = (nk * 50 + 99) // 100 THEN sz END)::BIGINT AS p50_size,
       |    min(CASE WHEN rk = (nk * 99 + 99) // 100 THEN sz END)::BIGINT AS p99_size
       |  FROM (
       |    SELECT sz, row_number() OVER (ORDER BY sz, k) AS rk, count(*) OVER () AS nk
       |    FROM (SELECT $keyName AS k, count(*)::BIGINT AS sz FROM events GROUP BY 1))) p""".stripMargin

  val skewAuditSql: String =
    skewAuditKeySql("user_id") + "\nUNION ALL\n" + skewAuditKeySql("event_type")

  // ---------------------------------------------------------------- window

  /** Q-WIN-1: top-3 events per user by value (row_number, unique
    * tiebreak on event_id → fully deterministic).
    */
  def winTop3(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rn"))
  }

  /** Q-WIN-2: rank + dense_rank customers by total spend within nation.
    * Spend is an exact decimal sum → tie structure is identical across
    * engines, making rank() deterministic.
    */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sumd(col("o_totalprice"), 18, 2).as("spend"))
    val w = Window.partitionBy("n_name").orderBy(col("spend").desc)
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("spend"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rnk") <= 10)
  }

  /** Q-WIN-3: running sum of value per user (rows frame). Decimal fold →
    * order-independent within the (totally ordered) frame.
    */
  def winRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
              sum(dec(col("value"))).over(w).cast(DoubleType).as("running_value"))
  }

  /** Q-WIN-4: lag() inter-event gap per user in microseconds (session
    * gap primitive).
    */
  def winLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
  }

  /** Q-WIN-5: distribution window functions — quartile assignment
    * (`ntile`), `percent_rank` and `cume_dist` per event type. The
    * order is tie-broken by event_id so every rank-derived value is
    * deterministic; percent_rank/cume_dist are single int/int double
    * divisions ⇒ bit-exact across engines.
    */
  def winDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  /** Q-WIN-7: navigation window functions — `first_value` /
    * `last_value` / `nth_value(2)` of the per-user event stream over
    * the full-partition frame (the "what did this user do first /
    * second / most recently" projection product analytics builds
    * constantly). Values pass through unaggregated (no float folds);
    * the (ts, event_id) order is tie-broken, so every navigated value
    * is deterministic.
    *
    * Shape at 100 TB: one user-keyed exchange serves all three
    * functions (same window spec); output is row-per-event with three
    * attached columns — a map-side projection after the sort.
    */
  def winNth(s: SparkSession, d: String): DataFrame = {
    val wf = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"), col("value"))
      .select(col("event_id"), col("user_id"),
        first(col("value")).over(wf).as("first_v"),
        nth_value(col("value"), 2).over(wf).as("second_v"),
        last(col("value")).over(wf).as("last_v"))
  }

  /** Q-WIN-6: RANGE-frame window — trailing 7-day revenue per event
    * type over the daily rollup (`RANGE BETWEEN 6 PRECEDING AND
    * CURRENT ROW` on an integer day index). The range frame is the one
    * frame variant the registry didn't exercise, and the one where
    * RANGE ≠ ROWS actually matters: calendar gaps (days with no
    * events) must NOT count toward the trailing window, and tied order
    * keys share one frame — which also makes the decimal sum a
    * set-sum, bit-exact with no tie-break column.
    *
    * Shape at 100 TB: the daily rollup is a map-side-combined
    * (type, day) aggregate — the window then runs keyed by event_type
    * over that V·days-row dimension, never over raw events.
    */
  def winFrame(s: SparkSession, d: String): DataFrame = {
    // rev stays DECIMAL through the window (sumd would hand the frame
    // sum a double and reintroduce order-dependent float accumulation)
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      .agg(sum(dec(col("value")))
        .cast(org.apache.spark.sql.types.DecimalType(14, 2)).as("rev"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    // window sums FIRST in the list: a `.as("rev")` earlier in the same
    // select would capture `rev` as a lateral column alias and sum the
    // double instead of the exact decimal
    daily.select(col("event_type"), col("day"),
      sum(col("rev")).over(w).cast(DoubleType).as("rev_7d"),
      count(lit(1)).over(w).cast(LongType).as("n_days_7d"),
      col("rev").cast(DoubleType).as("rev"))
  }

  /** Q-AGG-9: exact median (and a decile) of `value` per event type —
    * no approximate percentile, no interpolation ambiguity: the median
    * is the mean of the two middle values of the tie-broken total
    * order (equal middles for odd counts), computed in decimal and
    * divided once.
    *
    * Shape at 100 TB: a rank window per key then a two-row-per-key
    * aggregation — the standard exact-quantile form when the quantile
    * set is fixed; sort-based window, no driver collect.
    */
  def aggMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 1) DIV 2") || col("rn") === expr("n DIV 2 + 1"))
      .groupBy(col("event_type"))
      .agg(
        first(col("n")).as("n"),
        (sum(dec(col("value"))).cast(DoubleType) / count(lit(1))).as("median"))
  }

  /** Q-PIVOT-1: per-user event-type matrix — `pivot` with an explicit
    * value list (explicit values keep the plan single-pass: no
    * distinct-values pre-query, fixed output schema at 100 TB).
    */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  val pivotEventsSql: String =
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'view') AS view,
      |  count(*) FILTER (WHERE event_type = 'click') AS click,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  count(*) FILTER (WHERE event_type = 'error') AS error
      |FROM events GROUP BY user_id""".stripMargin

  /** Q-PIVOT-2: unpivot (melt) the order's price/key columns back to
    * long form — the inverse reshape.
    */
  def unpivotOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_custkey").cast(DoubleType).as("o_custkey_d"))
      .unpivot(
        Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("o_custkey_d")),
        "metric", "val")

  val unpivotOrdersSql: String =
    """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'o_custkey_d', CAST(o_custkey AS DOUBLE) FROM orders""".stripMargin

  // ----------------------------------------------------------- sort/limit

  /** Q-SORT-1: global top-100 events by value — plans as
    * TakeOrderedAndProject (per-partition heaps, only 100 rows cross the
    * network), never a full global sort.
    */
  def sortTop100(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .orderBy(col("value").desc, col("event_id"))
      .limit(100)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))

  /** Q-SORT-2: top-50 orders by totalprice. */
  def sortOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Q-TPCH-3: shipping-priority style — filtered fact⋈dim join, group,
    * exact-decimal revenue, global top-10 (TakeOrderedAndProject after
    * a broadcast join + partial agg).
    */
  def tpchQ3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1995-03-15 00:00:00")))
      .join(Tables.orders(s, d).filter(col("o_orderdate") < to_timestamp(lit("1995-03-15 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
      .agg(sum(dec(col("l_extendedprice"), 14, 2) * (lit(1) - dec(col("l_discount"), 14, 2)))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  val tpchQ3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q-SUB-1: correlated scalar subquery — customers above their
    * nation's average balance; Catalyst decorrelates this into an
    * aggregate + join (the §4 "free" optimization), expressed through
    * the SQL surface.
    */
  def subCorrelated(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    // exact-decimal comparison (bal·n > Σbal) — a float avg() would be
    // summation-order-dependent across engines
    s.sql(
      """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
        |FROM customer_v c
        |WHERE CAST(c_acctbal AS DECIMAL(14,2)) *
        |      (SELECT count(*) FROM customer_v c2 WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(14,2))) FROM customer_v c2
        |       WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  val subCorrelatedSql: String =
    """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
      |FROM customer c
      |WHERE CAST(c_acctbal AS DECIMAL(14,2)) *
      |      (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |    > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(14,2))) FROM customer c2
      |       WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  // -------------------------------------------------------------- set ops

  private def users(s: SparkSession, d: String, et: String): DataFrame =
    Tables.events(s, d).filter(col("event_type") === et).select(col("user_id"))

  /** Q-SET-1: distinct union of signup ∪ purchase user sets. */
  def setUnion(s: SparkSession, d: String): DataFrame =
    users(s, d, "signup").union(users(s, d, "purchase")).distinct()

  /** Q-SET-2: users with both purchase ∩ error. */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").intersect(users(s, d, "error"))

  /** Q-SET-3: users with view but no purchase. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    users(s, d, "view").except(users(s, d, "purchase"))

  // ----------------------------------------------------------- scalar fns

  /** Q-FN-1: string functions over part. */
  def fnString(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 4).as("name4"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        length(col("p_name")).as("name_len"),
        replace(col("p_name"), lit("widget"), lit("gadget")).as("renamed"))

  /** Q-FN-2: date/time functions over orders (RFC3339 parse mirrored by
    * the ingest path; here: extraction + truncation + diff).
    */
  def fnDate(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      quarter(col("o_orderdate")).as("qtr"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01"))).as("days_since"))

  /** Q-FN-3: math functions over lineitem. */
  def fnMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("abs_disc"),
        floor(col("l_extendedprice")).as("floor_price"),
        round(dec(col("l_quantity"), 10, 2) * dec(col("l_extendedprice"), 14, 2), 0)
          .cast(LongType).as("qty_price"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        (col("l_orderkey") % 7).as("key_mod"))

  /** Q-AGG-SKETCH: mergeable distinct-count sketches (Apache
    * DataSketches HLL via `hll_sketch_agg`/`hll_union_agg`) — the
    * 100 TB pattern behind every "monthly uniques" dashboard: distinct
    * counts do NOT sum, so per-day counts can't roll up; per-day
    * SKETCHES can. Daily sketches are built once (and in production
    * persisted to the lake as binary columns); any window rolls up by
    * unioning sketches — no rescan of raw events. Sketch internals
    * differ across implementations, so the union ESTIMATE can't
    * hash-match DuckDB; it is bounded IN-ROW against its exact-distinct
    * twin (cross-joined single rows — both sides one row, the join is
    * trivial) so every output column is deterministic and the driver
    * checks the full row.
    */
  def aggSketchRollup(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        countDistinct(col("user_id")).as("daily_users"))
    val exact = Tables.events(s, d)
      .agg(countDistinct(col("user_id")).as("exact_total_users"))
    daily.agg(
        count(lit(1)).as("n_days"),
        sum(col("daily_users")).as("sum_daily_users"), // > true distinct: why sketches exist
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_total_users"))
      .crossJoin(exact)
      // default lgConfigK=12 → ~1.6% rse; gate loose at 5%
      .select(col("n_days"), col("sum_daily_users"), col("exact_total_users"),
        (abs(col("est_total_users") - col("exact_total_users")) <=
          col("exact_total_users") * lit(0.05)).as("est_within_5pct"))
  }

  /** Sketch size for [[aggThetaOverlap]]: 2¹⁰ = 1024 retained hashes
    * (~8 KB compact) → ~3.1% relative standard error in estimation
    * mode. Production dashboards typically run lgK 12–16; the gates
    * below are sized for this lgK.
    */
  val ThetaLgK = 10

  /** Theta-sketch overlap core over a keyed cohort table `(k, a, b)`:
    * item key + membership flags for cohorts A and B. Exposed for the
    * spec; the registered query is [[aggThetaOverlap]].
    *
    * Exact twin: one compact-key shuffle (groupBy k, flag ORs, count).
    * Sketch side: MAP-ONLY — each input partition builds two local
    * `UpdateSketch`es and emits their ~8 KB compact forms; the driver
    * merge is bounded by 2 × partitions × 8 KB (the same k-bounded
    * collect contract as the k-means centroids). Theta's retained set
    * is the k smallest hash values of the DISTINCT key set — a pure
    * function of the set, so estimates are partition- and
    * order-invariant (DeterminismSpec).
    */
  def thetaOverlap(keyed: DataFrame): DataFrame = {
    val exact = keyed.groupBy(col("k"))
      .agg(max(col("a")).as("ia"), max(col("b")).as("ib"))
      .agg(
        sum(when(col("ia"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("ib"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("ia") && col("ib"), 1L).otherwise(0L)).as("n_and"),
        count(lit(1)).as("n_or"))
    val est = thetaEstimates(keyed)
    // union/operand gates: RSE is relative to the estimated set itself
    def ok(estV: Double, exactCol: org.apache.spark.sql.Column) =
      abs(lit(estV) - exactCol.cast(DoubleType)) <= exactCol.cast(DoubleType) * 0.10 + 32.0
    // INTERSECTION error scales with the UNION (RSE grows ~sqrt(n_or /
    // n_and)), so a fixed pct-of-n_and envelope breaks at low overlap
    // fractions; gate against the sketch's own 3-σ confidence interval
    // instead (exact mode collapses it to a point; ±32 floors tiny sets)
    exact.select(
      col("n_a"), col("n_b"), col("n_and"), col("n_or"),
      (col("n_and").cast(DoubleType) / col("n_or").cast(DoubleType)).as("jaccard"),
      ok(est.a, col("n_a")).as("est_a_ok"),
      ok(est.b, col("n_b")).as("est_b_ok"),
      (col("n_and").cast(DoubleType) >= lit(est.andLb) - 32.0 &&
        col("n_and").cast(DoubleType) <= lit(est.andUb) + 32.0).as("est_and_ok"),
      ok(est.or, col("n_or")).as("est_or_ok"))
  }

  /** [[thetaEstimates]] result: the four set estimates plus the
    * intersection's own 3-σ confidence bounds (`getLowerBound(3)` /
    * `getUpperBound(3)`), which size the `est_and_ok` gate — the
    * library's interval accounts for how intersection error compounds
    * with the union size, where any fixed pct-of-n_and envelope does
    * not.
    */
  final case class ThetaEst(a: Double, b: Double, and: Double, or: Double,
      andLb: Double, andUb: Double)

  /** The sketch path of [[thetaOverlap]]: per-partition theta builds,
    * k-bounded driver merge, returns (|A|, |B|, |A∩B|, |A∪B|)
    * estimates + intersection bounds. Exposed so the spec can assert
    * exact-mode equality and estimation-mode accuracy directly.
    */
  def thetaEstimates(keyed: DataFrame): ThetaEst = {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
    val encIn = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaBoolean,
      org.apache.spark.sql.Encoders.scalaBoolean)
    val encOut = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaBoolean,
      org.apache.spark.sql.Encoders.BINARY)
    val partials = keyed.select(col("k"), col("a"), col("b")).as[(Long, Boolean, Boolean)](encIn)
      .mapPartitions { it =>
        val sa = UpdateSketch.builder().setLogNominalEntries(ThetaLgK).build()
        val sb = UpdateSketch.builder().setLogNominalEntries(ThetaLgK).build()
        it.foreach { case (k, a, b) => if (a) sa.update(k); if (b) sb.update(k) }
        Iterator((true, sa.compact().toByteArray), (false, sb.compact().toByteArray))
      }(encOut).collect()
    graft.HeapWatermark.record("theta_sketch_partials",
      partials.foldLeft(0L)((a, p) => a + 17L + p._2.length))
    val ua = SetOperation.builder().setLogNominalEntries(ThetaLgK).buildUnion()
    val ub = SetOperation.builder().setLogNominalEntries(ThetaLgK).buildUnion()
    partials.foreach { case (isA, bytes) =>
      val sk = Sketches.wrapSketch(Memory.wrap(bytes))
      if (isA) ua.union(sk) else ub.union(sk)
    }
    val inter = SetOperation.builder().setLogNominalEntries(ThetaLgK).buildIntersection()
    inter.intersect(ua.getResult); inter.intersect(ub.getResult)
    val uor = SetOperation.builder().setLogNominalEntries(ThetaLgK).buildUnion()
    uor.union(ua.getResult); uor.union(ub.getResult)
    val interRes = inter.getResult
    ThetaEst(ua.getResult.getEstimate, ub.getResult.getEstimate,
      interRes.getEstimate, uor.getResult.getEstimate,
      interRes.getLowerBound(3), interRes.getUpperBound(3))
  }

  /** Q-AGG-THETA: cohort overlap via Theta sketches — the companion to
    * [[aggSketchRollup]] for the question HLL cannot answer: "how many
    * items are in BOTH audiences?" HLL unions; Theta (Apache
    * DataSketches, on Spark's own classpath) supports set INTERSECTION
    * with bounded error, so two cohorts summarized independently (and
    * in production persisted to the lake as ~8 KB binary columns) can
    * be intersected without rescanning raw events.
    *
    * The item is an active (user, day) pair — `user_id·10⁵ + epoch
    * day` (day < 10⁵ until year 2243) — so cohort A = click-days and
    * cohort B = purchase-days overlap partially at any scale; the
    * exact columns (`n_a/n_b/n_and/n_or/jaccard`) hash-match DuckDB
    * and each sketch estimate is gated in-row against its exact twin
    * (the estimate-twin pattern).
    *
    * Shape at 100 TB: the sketch path is one map-only pass + a
    * 2×partitions×8 KB driver merge — no shuffle at all; the exact
    * twin's compact-key shuffle exists only to earn the oracle hash.
    */
  /** The cohort item table for [[aggThetaOverlap]] (and its streaming
    * twin [[graft.streaming.Streaming.thetaCohortStream]]).
    */
  def thetaKeyed(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        (col("user_id") * 100000L + expr("unix_micros(ts) DIV 86400000000")).as("k"),
        (col("event_type") === "click").as("a"),
        (col("event_type") === "purchase").as("b"))

  def aggThetaOverlap(s: SparkSession, d: String): DataFrame =
    thetaOverlap(thetaKeyed(s, d))

  val aggThetaOverlapSql: String =
    """WITH k AS (
      |  SELECT user_id * 100000 + epoch_us(ts) // 86400000000 AS k,
      |    bool_or(event_type = 'click') AS ia,
      |    bool_or(event_type = 'purchase') AS ib
      |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1)
      |SELECT sum(CASE WHEN ia THEN 1 ELSE 0 END)::BIGINT AS n_a,
      |  sum(CASE WHEN ib THEN 1 ELSE 0 END)::BIGINT AS n_b,
      |  sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END)::BIGINT AS n_and,
      |  count(*)::BIGINT AS n_or,
      |  sum(CASE WHEN ia AND ib THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS jaccard,
      |  TRUE AS est_a_ok, TRUE AS est_b_ok, TRUE AS est_and_ok, TRUE AS est_or_ok
      |FROM k""".stripMargin

  /** Q-SQL-1: the SQL-text entrypoint — the engine's tables exposed as
    * views and queried with `spark.sql(...)` rather than the DataFrame
    * DSL (the reference's users write ad-hoc SQL over the landed lake,
    * `README.md:237-258`; PostHog's own surface is HogQL text). Same
    * Catalyst plan either way — this registers the path, not a new
    * operator: a DAU/intensity insight as a user would type it.
    */
  def sqlInsight(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT day, count(DISTINCT user_id) AS dau, count(*) AS n_events,
        |  cast(count(*) AS double) / count(DISTINCT user_id) AS events_per_user
        |FROM (SELECT unix_micros(ts) DIV 86400000000 AS day, user_id FROM events_v)
        |GROUP BY day""".stripMargin)
  }

  val sqlInsightSql: String =
    """SELECT day, count(DISTINCT user_id) AS dau, count(*) AS n_events,
      |  count(*)::DOUBLE / count(DISTINCT user_id) AS events_per_user
      |FROM (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events)
      |GROUP BY day""".stripMargin

  /** Q-FN-MORTON: the z-order clustering key ([[graft.sources.Lake.zvalue]])
    * exercised as a query: events mapped to an 8-bit (user-bucket,
    * day-bucket) grid and Morton-interleaved — the exact int64 the
    * lake's `zorderWrite` range-partitions on. Bit-identical across
    * engines (pure shifts/masks/ors).
    */
  def fnMorton(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") % 50 === 0)
      .select(col("event_id"),
        (col("user_id") % 256).as("xb"),
        (expr("unix_micros(ts) DIV 86400000000") % 256).as("yb"))
      .select(col("event_id"), col("xb"), col("yb"),
        graft.sources.Lake.zvalue(col("xb"), col("yb")).as("zval"))

  val fnMortonSql: String = {
    val z = (0 until 8).map(b =>
      s"(((xb >> $b) & 1) << ${2 * b + 1}) | (((yb >> $b) & 1) << ${2 * b})")
      .mkString(" | ")
    s"""SELECT event_id, xb, yb, ($z) AS zval
       |FROM (SELECT event_id, user_id % 256 AS xb,
       |        (epoch_us(ts) // 86400000000) % 256 AS yb
       |      FROM events WHERE event_id % 50 = 0)""".stripMargin
  }

  /** Q-FN-4: JSON extraction from the dynamic `props` payload (the
    * reference's schemaless-properties pattern, `fake_pipeline.py:62`).
    */
  def fnJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .filter(col("k") > 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("k")).as("sum_k"),
           (sum(col("k")).cast(DoubleType) / count(lit(1))).as("avg_k"))

  /** Q-FN-5: array functions over the embedding column — size, element
    * access, and an L2-norm² via the `aggregate` higher-order function
    * (codegen'd; the exact same left-fold the DuckDB oracle runs).
    */
  def fnArray(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast(DoubleType).as("first_elem"),
      aggregate(
        col("embedding"),
        lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)).as("norm_sq"))

  /** Q-FN-6: URL parsing — host / path / query / single-parameter
    * extraction with `parse_url` (the clickstream-analytics scalar
    * family; the reference's SDK payloads carry `$current_url`). URLs
    * are synthesized deterministically from `documents`, so the oracle
    * re-derives every component directly from the base columns — an
    * independent derivation that cross-checks `parse_url`'s semantics
    * rather than re-running them.
    */
  def fnUrl(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("lang"), lit(".example.com/docs/"),
      col("doc_id"), lit("?src="), col("source"), lit("&k="), col("doc_id") % 7)
    Tables.documents(s, d)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("src")).as("src_param"),
        parse_url(col("url"), lit("PROTOCOL")).as("protocol"))
  }

  val fnUrlSql: String =
    """SELECT doc_id,
      |  lang || '.example.com' AS host,
      |  '/docs/' || doc_id AS path,
      |  'src=' || source || '&k=' || (doc_id % 7) AS query,
      |  source AS src_param,
      |  'https' AS protocol
      |FROM documents""".stripMargin

  /** Q-FN-8: IPv4 / CIDR function family over the enrichment IPs the
    * ingest layer attaches (`$ip` — `extractors.rs` request
    * enrichment): dotted-quad → uint32 (pure arithmetic, no UDF), /24
    * subnet rollup (the abuse/geo aggregation unit), and a CIDR
    * containment flag (`10.42.0.0/16` — a prefix compare on the top
    * bits). Everything folds to integer arithmetic the oracle mirrors
    * verbatim; at 100 TB this is one map pass + one compact-key rollup
    * (subnet ints, map-side combined).
    */
  def fnIp(s: SparkSession, d: String): DataFrame = {
    val ip = concat(lit("10."), col("user_id") % 200, lit("."),
      expr("(user_id div 200) % 250"), lit("."), col("event_id") % 250)
    val oct = split(col("ip"), "\\.")
    val ipInt = element_at(oct, 1).cast(LongType) * 16777216L +
      element_at(oct, 2).cast(LongType) * 65536L +
      element_at(oct, 3).cast(LongType) * 256L +
      element_at(oct, 4).cast(LongType)
    // 10.42.0.0/16 ⇒ compare the top 16 bits: ip_int div 65536 == 10·256+42
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), ip.as("ip"))
      .select(col("user_id"), ipInt.as("ip_int"))
      .select(col("user_id"), col("ip_int"),
        expr("ip_int div 256").as("subnet24"),
        (expr("ip_int div 65536") === lit(10L * 256L + 42L)).as("in_net"))
      .groupBy(col("subnet24"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("in_net")).as("in_10_42_16"))
      .select(
        concat(expr("subnet24 div 65536"), lit("."),
          expr("(subnet24 div 256) % 256"), lit("."),
          col("subnet24") % 256L, lit(".0/24")).as("subnet"),
        col("n_events"), col("n_users"), col("in_10_42_16"))
  }

  val fnIpSql: String =
    """WITH ips AS (
      |  SELECT user_id,
      |    '10.' || (user_id % 200) || '.' || ((user_id // 200) % 250) || '.' || (event_id % 250) AS ip
      |  FROM events),
      |parsed AS (
      |  SELECT user_id,
      |    string_split(ip, '.')[1]::BIGINT * 16777216 +
      |    string_split(ip, '.')[2]::BIGINT * 65536 +
      |    string_split(ip, '.')[3]::BIGINT * 256 +
      |    string_split(ip, '.')[4]::BIGINT AS ip_int
      |  FROM ips),
      |marked AS (
      |  SELECT user_id, ip_int, ip_int // 256 AS subnet24,
      |    (ip_int // 65536 = 10 * 256 + 42) AS in_net
      |  FROM parsed)
      |SELECT
      |  (subnet24 // 65536) || '.' || ((subnet24 // 256) % 256) || '.' || (subnet24 % 256) || '.0/24' AS subnet,
      |  count(*)::BIGINT AS n_events,
      |  count(DISTINCT user_id)::BIGINT AS n_users,
      |  max(in_net) AS in_10_42_16
      |FROM marked GROUP BY subnet24""".stripMargin

  /** Q-FN-9: IPv6 parse + prefix containment — the `inet6` companion
    * to [[fnIp]]'s dotted-quad family. Addresses are synthesized
    * deterministically (`2001:db8:a:b::c`, exercising `::`
    * zero-compression including the empty-tail `…::` form when the
    * last group is 0), then PARSED back on the Spark side: expand the
    * `::` gap to 8 groups, hex-parse each (`conv`, codegen'd — no
    * UDF), fold the upper half to one int64, and test /32 and /48
    * prefix containment as integer compares — exactly how an engine
    * stores inet6 (two uint64 halves) and evaluates `<<=`.
    *
    * The oracle derives hi64 ARITHMETICALLY from the base columns
    * (the [[fnUrl]] pattern: an independent derivation cross-checks
    * the parse path rather than re-running it), so a Spark-side
    * expansion/hex bug cannot self-confirm.
    *
    * Shape at 100 TB: one map pass (synthesize + parse are per-row
    * codegen'd expressions) into a compact-key /48 rollup, map-side
    * combined; the single distinct rides the same two-level aggregate
    * (never the multi-distinct Expand rewrite).
    */
  /** Upper 64 bits of a possibly-`::`-compressed IPv6 address as one
    * int64 — expand the compression to 8 hex groups, `conv`-parse each
    * (codegen'd, case-insensitive, empty group = 0, so leading-`::`
    * forms work), fold groups 0–3 big-endian. Requires the first group
    * < 0x8000 (the signed fold's headroom; every globally-routable
    * 2000::/3 address qualifies). Fuzzed against
    * `java.net.InetAddress` in OperatorFuzzSpec.
    */
  def ipv6Hi(addr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val halves = split(addr, "::")
    val leftG = split(element_at(halves, 1), ":")
    val rightG = when(size(halves) < 2 || element_at(halves, 2) === "",
        array().cast("array<string>"))
      .otherwise(split(element_at(halves, 2), ":"))
    val full = concat(leftG,
      array_repeat(lit("0"), lit(8) - size(leftG) - size(rightG)), rightG)
    def grp(i: Int): org.apache.spark.sql.Column =
      coalesce(conv(element_at(full, i + 1), 16, 10).cast(LongType), lit(0L))
    grp(0) * 281474976710656L + grp(1) * 4294967296L +
      grp(2) * 65536L + grp(3)
  }

  def fnIp6(s: SparkSession, d: String): DataFrame = {
    val a = col("user_id") % 65536L
    val b = col("event_id") % 65536L
    val cc = (col("user_id") * 7L + 3L) % 65536L
    val addr = concat(lit("2001:db8:"), lower(hex(a)), lit(":"), lower(hex(b)),
      lit("::"), when(cc === 0L, lit("")).otherwise(lower(hex(cc))))
    Tables.events(s, d)
      .select(col("user_id"), addr.as("addr"))
      .select(col("user_id"), ipv6Hi(col("addr")).as("hi"))
      .select(col("user_id"), col("hi"),
        expr("hi div 65536").as("site48"),
        (expr("hi div 4294967296") === lit(8193L * 65536L + 3512L)).as("in32"),
        (expr("hi div 65536") ===
          lit(8193L * 4294967296L + 3512L * 65536L + 42L)).as("in48"))
      .groupBy(col("site48"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("in32")).as("in_2001_db8_32"),
        max(col("in48")).as("in_2001_db8_2a_48"))
  }

  val fnIp6Sql: String =
    """WITH p AS (
      |  SELECT user_id,
      |    8193 * 4294967296 + 3512 * 65536 + (user_id % 65536) AS site48
      |  FROM events)
      |SELECT site48, count(*)::BIGINT AS n_events,
      |  count(DISTINCT user_id)::BIGINT AS n_users,
      |  max(TRUE) AS in_2001_db8_32,
      |  max(site48 % 65536 = 42) AS in_2001_db8_2a_48
      |FROM p GROUP BY site48""".stripMargin

  /** Q-AGG-10: exact fixed quantiles (p25/p50/p75, lower-value
    * discretized: the element at rank ⌈p·n⌉ of the tie-broken total
    * order) per event type — generalizes [[aggMedian]] to a quantile
    * SET with the same rank-window + conditional-aggregation shape
    * (one sort per key, three rows survive per group, no interpolated
    * floats to disagree on).
    */
  def aggQuantiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 3) DIV 4") ||
        col("rn") === expr("(n + 1) DIV 2") ||
        col("rn") === expr("(3 * n + 3) DIV 4"))
      .groupBy(col("event_type"))
      .agg(
        first(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 3) DIV 4"), col("value"))).as("p25"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("value"))).as("p50"),
        max(when(col("rn") === expr("(3 * n + 3) DIV 4"), col("value"))).as("p75"))
  }

  val aggQuantilesSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, any_value(n) AS n,
      |  max(CASE WHEN rn = (n + 3) // 4 THEN value END) AS p25,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
      |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) AS p75
      |FROM r
      |WHERE rn = (n + 3) // 4 OR rn = (n + 1) // 2 OR rn = (3 * n + 3) // 4
      |GROUP BY event_type""".stripMargin

  /** Q-AGG-11: MERGEABLE approximate quantiles (`approx_percentile`,
    * Greenwald-Khanna summaries) beside rank-selected exact twins —
    * the [[aggApprox]] estimate-twin pattern applied to percentiles.
    * Exact per-group quantiles at 100 TB mean a per-key sort (or a
    * per-group array) — a non-starter; the single-pass mergeable
    * summary IS the production operator, and the exact path here
    * exists to oracle-gate it. The sketch's rank-error contract
    * (ε = 1/accuracy) is checked IN-ROW: each estimate must land
    * between the exact order statistics at q ± 0.05 (vastly looser
    * than ε = 10⁻⁴, so a correct sketch never flakes and a broken one
    * fails loudly). All exact columns hash-match DuckDB; the booleans
    * are deterministically TRUE.
    */
  def aggApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    // exact order statistics at q−δ / q / q+δ for q ∈ {0.5, 0.9, 0.99}
    // (p99's upper bound clamps to the max, rank n) — one sorted window
    // pass, nine surviving rows per group
    val ranks = Seq(
      "lo45" -> "(45 * n + 99) DIV 100", "p50" -> "(n + 1) DIV 2",
      "hi55" -> "(55 * n + 99) DIV 100",
      "lo85" -> "(85 * n + 99) DIV 100", "p90" -> "(9 * n + 9) DIV 10",
      "hi95" -> "(95 * n + 99) DIV 100",
      "lo94" -> "(94 * n + 99) DIV 100", "p99" -> "(99 * n + 99) DIV 100",
      "hin" -> "n")
    val exact = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(ranks.map { case (_, r) => col("rn") === expr(r) }.reduce(_ || _))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        ranks.map { case (name, r) =>
          max(when(col("rn") === expr(r), col("value"))).as(name)
        }: _*)
    val approx = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)").as("ap"))
    exact.join(approx, Seq("event_type"))
      .select(col("event_type"), col("n"), col("p50"), col("p90"), col("p99"),
        col("ap")(0).between(col("lo45"), col("hi55")).as("a50_ok"),
        col("ap")(1).between(col("lo85"), col("hi95")).as("a90_ok"),
        col("ap")(2).between(col("lo94"), col("hin")).as("a99_ok"))
  }

  val aggApproxQuantilesSql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, any_value(n) AS n,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
      |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
      |  max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99,
      |  TRUE AS a50_ok, TRUE AS a90_ok, TRUE AS a99_ok
      |FROM r
      |WHERE rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10 OR rn = (99 * n + 99) // 100
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------- Q-SCAN-drift

  /** Q-SCAN-DRIFT: payload SCHEMA/VALUE drift audit — the ingestion
    * health check a schemaless `properties` column needs at 100 TB:
    * per JSON key, compare the two halves of the stream (split on the
    * time-monotone event-id midpoint — at scale the split key is the
    * ingestion-date partition column) on presence, distinct-value
    * count, and the numeric mean (quantized to integer micros, the
    * `q_sim_drift` discipline). A key that appears only in half B is
    * a NEW field (SDK rollout); one only in A was dropped; a mean
    * shift past the pinned threshold flags a semantic change behind a
    * stable schema (unit change, enum remap).
    *
    * Shape at 100 TB: one pass over the props column (key explosion is
    * per-row, bounded by payload width), one map-side-combined rollup
    * to the |keys|-row dimension; the midpoint is a 1-row aggregate
    * broadcast back. No window, no join on facts.
    */
  val ScanDriftTauMicro = 2000000L // |mean shift| > 2.0 flags

  def scanDrift(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val mid = e.agg(floor(max(col("event_id")) / 2).cast(LongType).as("mid"))
    val kv = e.crossJoin(broadcast(mid))
      .select((col("event_id") <= col("mid")).as("is_a"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))).as(Seq("key", "v")))
      .select(col("is_a"), col("key"), col("v"),
        // try_cast: ANSI mode is on; a non-numeric value must become
        // NULL (counted in nonnum_*), not throw
        round(expr("try_cast(v AS double)") * 1e6).cast(LongType).as("qx"))
    kv.groupBy(col("key"))
      .agg(
        count(when(col("is_a"), 1)).as("n_a"),
        count(when(!col("is_a"), 1)).as("n_b"),
        countDistinct(when(col("is_a"), col("v"))).as("ndv_a"),
        countDistinct(when(!col("is_a"), col("v"))).as("ndv_b"),
        sum(when(col("is_a"), col("qx")).otherwise(0L)).as("qsum_a"),
        sum(when(!col("is_a"), col("qx")).otherwise(0L)).as("qsum_b"),
        count(when(col("is_a") && col("qx").isNull, 1)).as("nonnum_a"),
        count(when(!col("is_a") && col("qx").isNull, 1)).as("nonnum_b"))
      .select(col("key"), col("n_a"), col("n_b"), col("ndv_a"), col("ndv_b"),
        col("qsum_a"), col("qsum_b"), col("nonnum_a"), col("nonnum_b"),
        when(col("n_a") === 0, lit("new"))
          .when(col("n_b") === 0, lit("dropped"))
          .when(col("nonnum_a") === 0 && col("nonnum_b") === 0 &&
            // DECIMAL(38,0) cross-multiply: qsum·n is ~1e19 already at
            // sf1 (long overflow, caught by the scale probe); DuckDB
            // computes this in HUGEINT, decimal keeps the engines exact
            abs(col("qsum_b").cast(DecimalType(38, 0)) * col("n_a") -
              col("qsum_a").cast(DecimalType(38, 0)) * col("n_b")) >
              lit(ScanDriftTauMicro).cast(DecimalType(38, 0)) * col("n_a") * col("n_b"),
            lit("mean_shift"))
          .otherwise(lit("stable")).as("verdict"))
  }

  val scanDriftSql: String =
    s"""WITH mid AS (SELECT max(event_id) // 2 AS mid FROM events),
       |kv AS (
       |  SELECT e.event_id <= mid.mid AS is_a, u.key,
       |    json_extract_string(e.props, '$$.' || u.key) AS v
       |  FROM events e CROSS JOIN mid, unnest(json_keys(e.props)) AS u(key)),
       |q AS (SELECT is_a, key, v,
       |    round(TRY_CAST(v AS DOUBLE) * 1000000.0)::BIGINT AS qx FROM kv)
       |SELECT key,
       |  count(*) FILTER (WHERE is_a)::BIGINT AS n_a,
       |  count(*) FILTER (WHERE NOT is_a)::BIGINT AS n_b,
       |  count(DISTINCT v) FILTER (WHERE is_a)::BIGINT AS ndv_a,
       |  count(DISTINCT v) FILTER (WHERE NOT is_a)::BIGINT AS ndv_b,
       |  coalesce(sum(qx) FILTER (WHERE is_a), 0)::BIGINT AS qsum_a,
       |  coalesce(sum(qx) FILTER (WHERE NOT is_a), 0)::BIGINT AS qsum_b,
       |  count(*) FILTER (WHERE is_a AND qx IS NULL)::BIGINT AS nonnum_a,
       |  count(*) FILTER (WHERE NOT is_a AND qx IS NULL)::BIGINT AS nonnum_b,
       |  CASE WHEN count(*) FILTER (WHERE is_a) = 0 THEN 'new'
       |       WHEN count(*) FILTER (WHERE NOT is_a) = 0 THEN 'dropped'
       |       WHEN count(*) FILTER (WHERE is_a AND qx IS NULL) = 0
       |        AND count(*) FILTER (WHERE NOT is_a AND qx IS NULL) = 0
       |        AND abs(coalesce(sum(qx) FILTER (WHERE NOT is_a), 0)
       |                  * count(*) FILTER (WHERE is_a)
       |                - coalesce(sum(qx) FILTER (WHERE is_a), 0)
       |                  * count(*) FILTER (WHERE NOT is_a))
       |            > $ScanDriftTauMicro * count(*) FILTER (WHERE is_a)
       |                * count(*) FILTER (WHERE NOT is_a)
       |       THEN 'mean_shift' ELSE 'stable' END AS verdict
       |FROM q GROUP BY key""".stripMargin

  // ---------------------------------------------------------------- oracle

  /** All relational queries with their DuckDB oracles. */
  val all: Seq[Q] = Seq(
    Q("q_scan_drift", scanDrift, Some(scanDriftSql)),
    Q("q_fn_url", fnUrl, Some(fnUrlSql)),
    Q("q_fn_ip", fnIp, Some(fnIpSql)),
    Q("q_fn_ip6", fnIp6, Some(fnIp6Sql)),
    Q("q_agg_quantiles", aggQuantiles, Some(aggQuantilesSql)),
    Q("q_agg_approx_quantiles", aggApproxQuantiles, Some(aggApproxQuantilesSql)),
    Q("q_scan_count", scanCount, Some("SELECT count(*) AS n FROM events")),
    Q("q_scan_tables", scanTables, Some(
      Tables.names.map(n => s"SELECT '$n' AS table_name, count(*) AS n FROM $n")
        .mkString(" UNION ALL "))),
    Q("q_scan_colstats", scanColStats, Some(scanColStatsSql)),
    Q("q_filt_events", filtEvents, Some(
      """SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
        |FROM events
        |WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'""".stripMargin)),
    Q("q_filt_lineitem", filtLineitem, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)),
    Q("q_join_multi", joinMulti, Some(
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)),
    Q("q_join_bcast", joinBroadcast, Some(
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)),
    Q("q_join_semi", joinSemi, Some(
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),
    Q("q_join_anti", joinAnti, Some(
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),
    Q("q_join_asof", joinAsOf, Some(
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  (SELECT epoch_us(max(s.ts)) FROM events s
        |    WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        |      AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))) AS asof_signup_us
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin)),
    Q("q_join_asof_fwd", joinAsOfFwd, Some(
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  (SELECT epoch_us(min(x.ts)) FROM events x
        |    WHERE x.user_id = e.user_id AND x.event_type = 'error'
        |      AND (x.ts > e.ts OR (x.ts = e.ts AND x.event_id > e.event_id))) AS next_error_us
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin)),
    Q("q_join_asof_tol", joinAsOfTol, Some(
      s"""WITH base AS (
         |  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         |    (SELECT epoch_us(max(s.ts)) FROM events s
         |      WHERE s.user_id = e.user_id AND s.event_type = 'signup'
         |        AND (s.ts < e.ts OR (s.ts = e.ts AND s.event_id <= e.event_id))) AS asof_us
         |  FROM events e WHERE e.event_type = 'purchase')
         |SELECT event_id, user_id, ts_us, ts_us - asof_us AS lag_us,
         |  CASE WHEN ts_us - asof_us <= $AsOfToleranceUs THEN asof_us END AS asof_signup_in_tol_us
         |FROM base""".stripMargin)),
    Q("q_join_asof_nearest", joinAsOfNearest, Some(joinAsOfNearestSql)),
    Q("q_agg_daily", aggDaily, Some(
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type, CAST(ts AS DATE)""".stripMargin)),
    Q("q_agg_q1", aggQ1, Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(14,2))) * (1 + CAST(l_tax AS DECIMAL(14,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)),
    Q("q_agg_distinct", aggDistinct, Some(
      """SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin)),
    Q("q_agg_approx", aggApprox, Some(
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS est_within_5pct
        |FROM events GROUP BY event_type""".stripMargin)),
    Q("q_agg_groupingsets", aggGroupingSets, Some(
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())""".stripMargin)),
    Q("q_agg_salted", aggSalted, Some(aggSaltedSql)),
    Q("q_agg_skew_audit", skewAudit, Some(skewAuditSql)),
    Q("q_agg_rollup", aggRollup, Some(
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))""".stripMargin)),
    Q("q_agg_cube", aggCube, Some(
      """SELECT c_mktsegment, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)""".stripMargin)),
    Q("q_win_top3", winTop3, Some(
      """SELECT user_id, event_id, value, CAST(rn AS INT) AS rn FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin)),
    Q("q_win_rank", winRank, Some(
      """SELECT c_custkey, c_name, n_name, spend, CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk FROM (
        |  SELECT c_custkey, c_name, n_name, spend,
        |    rank() OVER (PARTITION BY n_name ORDER BY spend DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY n_name ORDER BY spend DESC) AS drnk
        |  FROM (
        |    SELECT c_custkey, c_name, n_name,
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |    FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    GROUP BY c_custkey, c_name, n_name))
        |WHERE rnk <= 10""".stripMargin)),
    Q("q_win_running", winRunning, Some(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin)),
    Q("q_win_lag", winLag, Some(
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events""".stripMargin)),
    Q("q_win_dist", winDist, Some(
      """SELECT event_id, event_type, value,
        |  ntile(4) OVER w::INT AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin)),
    Q("q_win_nth", winNth, Some(
      """SELECT event_id, user_id,
        |  first_value(value) OVER w AS first_v,
        |  nth_value(value, 2) OVER w AS second_v,
        |  last_value(value) OVER w AS last_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)),
    Q("q_win_frame", winFrame, Some(
      """WITH daily AS (
        |  SELECT event_type,
        |    datediff('day', DATE '2024-01-01', ts::DATE)::INT AS day,
        |    sum(value::DECIMAL(14,2))::DECIMAL(14,2) AS rev
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, rev::DOUBLE AS rev,
        |  (sum(rev) OVER (PARTITION BY event_type ORDER BY day
        |     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))::DOUBLE AS rev_7d,
        |  (count(*) OVER (PARTITION BY event_type ORDER BY day
        |     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))::BIGINT AS n_days_7d
        |FROM daily""".stripMargin)),
    Q("q_agg_median", aggMedian, Some(
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, any_value(n) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS median
        |FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |GROUP BY event_type""".stripMargin)),
    Q("q_pivot_events", pivotEvents, Some(pivotEventsSql)),
    Q("q_unpivot_orders", unpivotOrders, Some(unpivotOrdersSql)),
    Q("q_sort_top100", sortTop100, Some(
      """SELECT event_id, event_type, user_id, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin)),
    Q("q_sort_orders", sortOrders, Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)),
    Q("q_tpch_q3", tpchQ3, Some(tpchQ3Sql)),
    Q("q_sub_correlated", subCorrelated, Some(subCorrelatedSql)),
    Q("q_set_union", setUnion, Some(
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),
    Q("q_set_intersect", setIntersect, Some(
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin)),
    Q("q_set_except", setExcept, Some(
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin)),
    Q("q_fn_string", fnString, Some(
      """SELECT p_partkey, upper(p_name) AS name_up,
        |  concat(p_brand, '/', p_type) AS brand_type,
        |  substr(p_name, 1, 4) AS name4,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  length(p_name) AS name_len,
        |  replace(p_name, 'widget', 'gadget') AS renamed
        |FROM part WHERE p_name LIKE '%widget%'""".stripMargin)),
    Q("q_fn_date", fnDate, Some(
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders""".stripMargin)),
    Q("q_fn_math", fnMath, Some(
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        |  CAST(round(CAST(l_quantity AS DECIMAL(10,2)) * CAST(l_extendedprice AS DECIMAL(14,2)), 0) AS BIGINT) AS qty_price,
        |  pow(l_quantity, 2) AS qty_sq,
        |  sqrt(l_extendedprice) AS sqrt_price,
        |  l_orderkey % 7 AS key_mod
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin)),
    Q("q_fn_morton", fnMorton, Some(fnMortonSql)),
    Q("q_sql_insight", sqlInsight, Some(sqlInsightSql)),
    Q("q_agg_sketch_rollup", aggSketchRollup, Some(
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    count(DISTINCT user_id) AS daily_users
        |  FROM events GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_days, sum(daily_users)::BIGINT AS sum_daily_users,
        |  (SELECT count(DISTINCT user_id) FROM events) AS exact_total_users,
        |  TRUE AS est_within_5pct
        |FROM daily""".stripMargin)),
    Q("q_agg_theta_overlap", aggThetaOverlap, Some(aggThetaOverlapSql)),
    Q("q_fn_json", fnJson, Some(
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |WHERE k > 50 GROUP BY event_type""".stripMargin)),
    Q("q_fn_array", fnArray, Some(
      """SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) AS norm_sq
        |FROM embeddings""".stripMargin))
  )
}
