package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import Det._

/** Product-analytics queries over the event stream — the workloads the
  * reference's own users run downstream of it (the reference is a
  * PostHog-compatible ingestion layer; funnels, retention cohorts and
  * time-window joins are the canonical PostHog read side,
  * `/root/reference/README.md:237-258` delegates them to DuckDB over
  * the landed lake).
  *
  * All three stick to integer arithmetic (event ids, epoch micros,
  * counts), so the DuckDB oracle hash-matches bit-for-bit.
  */
object Product {

  // ---------------------------------------------------------------- funnel

  /** Q-PROD-1: ordered 3-step funnel (view → click → purchase) per
    * user: the first view, the first click AFTER that view, the first
    * purchase AFTER that click (strict event-id order — the table's
    * ids are time-monotone). One row per user who entered the funnel,
    * with the step events and the depth reached.
    *
    * Shape at 100 TB: three conditional-min aggregations over the
    * compact (user_id, event_type, event_id) projection and three
    * user-keyed joins — every stage keys on `user_id`, so one shuffle
    * partitioning is reused end-to-end (co-partitioned joins, no
    * re-shuffle); no per-user event arrays are ever materialized
    * (the collect_list-then-sort funnel folds OOM on heavy users;
    * conditional mins don't).
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"))
    val s1 = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("view_eid"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("click_eid"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("event_id") > col("click_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("purchase_eid"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("view_eid"), col("click_eid"), col("purchase_eid"),
        (lit(1) + when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("steps_reached"))
  }

  val funnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(event_id) AS view_eid
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.event_id) AS click_eid
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.event_id > s1.view_eid
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.event_id) AS purchase_eid
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.event_id > s2.click_eid
      |  GROUP BY e.user_id)
      |SELECT s1.user_id, s1.view_eid, s2.click_eid, s3.purchase_eid,
      |  (1 + CASE WHEN s2.click_eid IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN s3.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin

  /** General N-step ordered funnel — [[funnel]]'s greedy
    * conditional-min chain for an ARBITRARY step list (PostHog funnels
    * take up to 20 steps): step k's match is the first event of its
    * type strictly after the step k−1 match. Output: one row per
    * entered user with `eid_1..eid_N` (nullable past the reached
    * depth) and `steps_reached`.
    *
    * Shape at 100 TB: N user-keyed conditional-min aggregates + N
    * left joins, all sharing ONE user-hash partitioning (no re-shuffle
    * between stages); never a per-user event array.
    */
  def funnelSteps(s: SparkSession, d: String, steps: Seq[String]): DataFrame =
    funnelStepsOver(
      Tables.events(s, d).select(col("user_id"), col("event_type"), col("event_id")),
      steps)

  /** [[funnelSteps]] over an arbitrary (user_id, event_type, event_id)
    * frame — the fuzzable core (OperatorFuzzSpec drives it on random
    * event streams against a driver-side greedy-chain recompute).
    */
  def funnelStepsOver(base: DataFrame, steps: Seq[String]): DataFrame = {
    // each stage table is consumed TWICE (the next stage's join and the
    // final N-way join) — persist the user-dimension-sized stages or
    // the static plan re-executes stage k's whole lineage N−k times
    def p(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var tables = Vector(p(
      base.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("event_id")).as("eid_1"))))
    for (i <- 1 until steps.length) {
      tables :+= p(base.filter(col("event_type") === steps(i))
        .join(tables(i - 1).select(col("user_id"), col(s"eid_$i")), Seq("user_id"))
        .filter(col("event_id") > col(s"eid_$i"))
        .groupBy(col("user_id")).agg(min(col("event_id")).as(s"eid_${i + 1}")))
    }
    val joined = tables.tail.foldLeft(tables.head)(
      (acc, t) => acc.join(t, Seq("user_id"), "left"))
    val depth = (2 to steps.length)
      .map(i => when(col(s"eid_$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): org.apache.spark.sql.Column)(_ + _)
    joined.select(col("user_id") +:
      steps.indices.map(i => col(s"eid_${i + 1}")) :+
      depth.cast(IntegerType).as("steps_reached"): _*)
  }

  /** The generated-oracle twin of [[funnelSteps]]. */
  def funnelStepsSql(steps: Seq[String]): String = {
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(event_id) AS eid_1
           |  FROM events WHERE event_type = '$st' GROUP BY user_id)"""
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(e.event_id) AS eid_${i + 1}
           |  FROM events e JOIN s$i USING (user_id)
           |  WHERE e.event_type = '$st' AND e.event_id > s$i.eid_$i
           |  GROUP BY e.user_id)"""
    }.mkString(",\n")
    val eids = steps.indices.map(i => s"eid_${i + 1}").mkString(", ")
    // N=1 renders "(1 + 0)" — the Scala side's foldLeft-over-lit(1) twin
    val depth = (2 to steps.length)
      .map(i => s"CASE WHEN eid_$i IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ") match { case "" => "0"; case t => t }
    val joins = (2 to steps.length)
      .map(i => s"LEFT JOIN s$i USING (user_id)").mkString(" ")
    s"""WITH $ctes
       |SELECT s1.user_id, $eids, (1 + $depth)::INT AS steps_reached
       |FROM s1 $joins""".stripMargin
  }

  /** Q-PROD-26: the 4-step instance (signup → view → click →
    * purchase) registered for the driver — the depth-generalization
    * proof of the funnel family.
    */
  private val DeepSteps = Seq("signup", "view", "click", "purchase")

  def funnelDeep(s: SparkSession, d: String): DataFrame =
    funnelSteps(s, d, DeepSteps)

  val funnelDeepSql: String = funnelStepsSql(DeepSteps)

  /** Q-PROD-27: funnel BY PERSON PROPERTY — the state × product
    * composition PostHog calls "funnel broken down by person property":
    * each user's funnel verdict attributed to their REPLAYED person
    * state's `plan` property (the full T1–T7 pipeline feeds the read
    * side — not an event property; the person property reflects
    * $set/$unset folds and identity merges). Per plan value:
    * entered/step/converted counts and the conversion rate.
    *
    * Shape at 100 TB: the person table is user-dimension-sized and
    * joins the funnel table user-keyed (the same hash partitioning the
    * funnel stages already share); the rollup is |plans|-row.
    */
  def funnelCohort(s: SparkSession, d: String): DataFrame = {
    val persons = graft.state.StateQueries.personDim(s, d)
      .select(
        regexp_extract(col("canonical_id"), "([0-9]+)$", 1)
          .cast(LongType).as("user_id"),
        coalesce(col("plan"), lit("none")).as("plan"))
    funnel(s, d).join(persons, Seq("user_id"))
      .groupBy(col("plan"))
      .agg(count(lit(1)).as("entered"),
        count(col("click_eid")).as("step2"),
        count(col("purchase_eid")).as("converted"))
      .withColumn("conv_rate",
        col("converted").cast("double") / col("entered"))
  }

  val funnelCohortSql: String =
    s"""WITH p AS (${graft.state.StateQueries.pipePersonsSql}),
       |f AS ($funnelSql),
       |pu AS (
       |  SELECT regexp_extract(canonical_id, '([0-9]+)$$', 1)::BIGINT AS user_id,
       |    coalesce(plan, 'none') AS plan
       |  FROM p)
       |SELECT plan, count(*)::BIGINT AS entered,
       |  count(click_eid)::BIGINT AS step2,
       |  count(purchase_eid)::BIGINT AS converted,
       |  count(purchase_eid)::DOUBLE / count(*) AS conv_rate
       |FROM f JOIN pu USING (user_id) GROUP BY plan""".stripMargin

  /** Q-PROD-29: trends BY PERSON PROPERTY — the third person-property
    * composition (funnel ✓, retention ✓): the daily event series split
    * by the replayed person state's `plan`, zero-filled onto the
    * (day × plan) grid. Unlike [[trendsBreakdown]] (an EVENT property
    * with top-K election) the plan dimension comes from the T1–T7
    * replay and is bounded by construction — no election needed.
    *
    * Shape at 100 TB: one user-keyed enrichment join (events ⋈
    * user-dimension persons — broadcast- or bucket-eligible), one
    * map-side-combined rollup to the (day × plan) dimension, and the
    * zero-fill grid from a 1-row bounds aggregate.
    */
  def trendsCohort(s: SparkSession, d: String): DataFrame = {
    val persons = graft.state.StateQueries.personDim(s, d)
      .select(
        regexp_extract(col("canonical_id"), "([0-9]+)$", 1)
          .cast(LongType).as("user_id"),
        coalesce(col("plan"), lit("none")).as("plan"))
    val daily = Tables.events(s, d)
      .join(persons, Seq("user_id"))
      .groupBy(to_date(col("ts")).as("day"), col("plan"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(broadcast(daily.select(col("plan")).distinct()))
    grid.join(daily, Seq("day", "plan"), "left")
      .select(col("day"), col("plan"), coalesce(col("n"), lit(0L)).as("n"))
  }

  val trendsCohortSql: String =
    s"""WITH p AS (${graft.state.StateQueries.pipePersonsSql}),
       |pu AS (
       |  SELECT regexp_extract(canonical_id, '([0-9]+)$$', 1)::BIGINT AS user_id,
       |    coalesce(plan, 'none') AS plan
       |  FROM p),
       |daily AS (
       |  SELECT CAST(e.ts AS DATE) AS day, pu.plan, count(*)::BIGINT AS n
       |  FROM events e JOIN pu USING (user_id) GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.day, s.plan
       |  FROM (SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
       |        FROM daily) d
       |  CROSS JOIN (SELECT DISTINCT plan FROM daily) s)
       |SELECT g.day, g.plan, coalesce(daily.n, 0)::BIGINT AS n
       |FROM grid g LEFT JOIN daily USING (day, plan)""".stripMargin

  /** Q-PROD-14: funnel TRENDS — PostHog's "conversion over time"
    * insight: users cohorted by their funnel ENTRY day (the day of the
    * first view that anchors their funnel), with per-cohort entry/step
    * counts and the end-to-end conversion rate. The same per-user
    * funnel table as [[funnel]] (one definition, cannot drift), joined
    * to the user's entry day and rolled up to the day dimension.
    *
    * Shape at 100 TB: every stage is user-keyed (the funnel joins and
    * the entry-day aggregate share the user hash partitioning); the
    * final rollup is dimension-sized. `entered` ≥ 1 by construction
    * (the cohort is defined by entry), so the rate division is safe
    * under ANSI.
    */
  def funnelDaily(s: SparkSession, d: String): DataFrame = {
    val entry = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min_by(to_date(col("ts")), col("event_id")).as("day"))
    funnel(s, d).join(entry, Seq("user_id"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("entered"),
        count(when(col("steps_reached") >= 2, 1)).as("clicked"),
        count(when(col("steps_reached") === 3, 1)).as("converted"))
      .withColumn("conversion",
        col("converted").cast("double") / col("entered"))
  }

  val funnelDailySql: String =
    s"""WITH f AS ($funnelSql),
       |entry AS (
       |  SELECT user_id, min_by(CAST(ts AS DATE), event_id) AS day
       |  FROM events WHERE event_type = 'view' GROUP BY user_id)
       |SELECT day, count(*)::BIGINT AS entered,
       |  count(*) FILTER (WHERE steps_reached >= 2)::BIGINT AS clicked,
       |  count(*) FILTER (WHERE steps_reached = 3)::BIGINT AS converted,
       |  count(*) FILTER (WHERE steps_reached = 3)::DOUBLE / count(*) AS conversion
       |FROM f JOIN entry USING (user_id)
       |GROUP BY day""".stripMargin

  // ------------------------------------------------------------- retention

  private val WeekUs = 604800000000L // 7 days in microseconds

  /** Q-PROD-2: weekly cohort retention — users bucketed by the week of
    * their first event (the cohort), then distinct active users per
    * (cohort, weeks-since) cell. The classic retention triangle.
    *
    * Shape at 100 TB: (user, week) pairs deduplicate BEFORE the cohort
    * join (distinct on the compact pair, map-side combined), the
    * first-week dimension joins on the same user-keyed partitioning,
    * and the final cell aggregation is over per-user rows — events
    * themselves never shuffle twice.
    */
  def retention(s: SparkSession, d: String): DataFrame = {
    val weeks = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
      .distinct()
    val firstWeek = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val retentionSql: String =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |fw AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id)
       |SELECT fw.cohort_week, w.week - fw.cohort_week AS week_offset,
       |  count(*) AS n_users
       |FROM weeks w JOIN fw USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  /** Q-PROD-28: retention BY PERSON PROPERTY — [[retention]]'s weekly
    * triangle split by the user's replayed person-state `plan` (the
    * same state × product composition as [[funnelCohort]]; PostHog
    * offers person-property breakdowns on every insight). Per
    * (plan, cohort_week, week_offset): distinct active users, plus the
    * cohort's week-0 size and the retention rate.
    *
    * Shape at 100 TB: identical to [[retention]] (compact (user, week)
    * pairs, one user-keyed partitioning reused) with the user-dimension
    * person join riding the same hash; the week-0 sizes broadcast back
    * onto the plan × triangle-sized rollup.
    */
  def retentionCohort(s: SparkSession, d: String): DataFrame = {
    val persons = graft.state.StateQueries.personDim(s, d)
      .select(
        regexp_extract(col("canonical_id"), "([0-9]+)$", 1)
          .cast(LongType).as("user_id"),
        coalesce(col("plan"), lit("none")).as("plan"))
    val weeks = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
      .distinct()
    val firstWeek = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val cells = weeks.join(firstWeek, Seq("user_id")).join(persons, Seq("user_id"))
      .groupBy(col("plan"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = cells.filter(col("week_offset") === 0)
      .select(col("plan"), col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(broadcast(base), Seq("plan", "cohort_week"))
      .select(col("plan"), col("cohort_week"), col("week_offset"),
        col("n_users"), col("cohort_size"),
        (col("n_users").cast("double") / col("cohort_size")).as("retained_rate"))
  }

  val retentionCohortSql: String =
    s"""WITH p AS (${graft.state.StateQueries.pipePersonsSql}),
       |pu AS (
       |  SELECT regexp_extract(canonical_id, '([0-9]+)$$', 1)::BIGINT AS user_id,
       |    coalesce(plan, 'none') AS plan
       |  FROM p),
       |weeks AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |fw AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id),
       |cells AS (
       |  SELECT pu.plan, fw.cohort_week, w.week - fw.cohort_week AS week_offset,
       |    count(*)::BIGINT AS n_users
       |  FROM weeks w JOIN fw USING (user_id) JOIN pu USING (user_id)
       |  GROUP BY 1, 2, 3),
       |base AS (
       |  SELECT plan, cohort_week, n_users AS cohort_size FROM cells
       |  WHERE week_offset = 0)
       |SELECT c.plan, c.cohort_week, c.week_offset, c.n_users, b.cohort_size,
       |  c.n_users::DOUBLE / b.cohort_size AS retained_rate
       |FROM cells c JOIN base b USING (plan, cohort_week)""".stripMargin

  // ------------------------------------------------------------ range join

  private val IvLenUs = 7200000000L  // 2 h interval
  private val BinUs = 3600000000L    // 1 h bins

  /** Q-PROD-3: point-in-interval range join, time-binned. Each signup
    * opens a 2-hour attribution window; count the user's events inside
    * each window. The naive `t BETWEEN lo AND hi` join degenerates to a
    * per-key cross product (Spark executes inequality joins as nested
    * loops); the scale form BINS the time axis — intervals explode to
    * the ≤3 hour-bins they cover, events carry their own bin, and the
    * pre-filter join is a plain EQUI-join on (user, bin) with the exact
    * range predicate applied after. Candidates are proportional to
    * interval×bin overlap, never |events|×|intervals|; each (event,
    * interval) pair arises from exactly one bin (the event's own), so
    * no dedup pass is needed.
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), tsUs(col("ts")).as("us"))
      .withColumn("bin", expr(s"us DIV $BinUs"))
    val iv = Tables.events(s, d)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), tsUs(col("ts")).as("iv_start"))
      .withColumn("iv_end", col("iv_start") + IvLenUs)
      .withColumn("bin", explode(expr(s"sequence(iv_start DIV $BinUs, iv_end DIV $BinUs)")))
    iv.join(ev, Seq("user_id", "bin"))
      .filter(col("us") >= col("iv_start") && col("us") <= col("iv_end"))
      .groupBy(col("user_id"), col("iv_start"))
      .agg(count(lit(1)).as("n_events"))
  }

  val rangeJoinSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, epoch_us(ts) AS iv_start, epoch_us(ts) + $IvLenUs AS iv_end
       |  FROM events WHERE event_type = 'signup')
       |SELECT i.user_id, i.iv_start, count(*) AS n_events
       |FROM iv i JOIN events e
       |  ON e.user_id = i.user_id
       | AND epoch_us(e.ts) >= i.iv_start AND epoch_us(e.ts) <= i.iv_end
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- lifecycle

  /** Q-PROD-4: user lifecycle per week — every active (user, week) is
    * classified `new` (first-ever active week), `returning` (also
    * active the immediately preceding week) or `resurrecting` (active
    * before, but not last week); additionally a `dormant` row is
    * emitted at `week+1` for users who go quiet (no activity next
    * week), bounded to the observed range. This is the PostHog
    * "lifecycle" insight computed exactly.
    *
    * Shape at 100 TB: events collapse to distinct (user, week) pairs
    * FIRST (map-side combined — the only pass over the payload), then
    * one user-keyed window provides both lag and lead, so `active` and
    * `dormant` derive from the same sorted frame without re-shuffling;
    * the final aggregation is over compact (week, status) pairs. The
    * range bound is a 1-row broadcast.
    */
  def lifecycle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weeks = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val lagged = weeks
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("next_week", lead(col("week"), 1).over(w))
    val maxWeek = weeks.agg(max(col("week")).as("max_week"))
    val active = lagged.select(
      col("week"),
      when(col("prev_week").isNull, "new")
        .when(col("week") - col("prev_week") === 1, "returning")
        .otherwise("resurrecting").as("status"))
    val dormant = lagged
      .crossJoin(broadcast(maxWeek))
      .filter(col("week") + 1 <= col("max_week") &&
        (col("next_week").isNull || col("next_week") > col("week") + 1))
      .select((col("week") + 1).as("week"), lit("dormant").as("status"))
    active.union(dormant)
      .groupBy(col("week"), col("status"))
      .agg(count(lit(1)).as("n_users"))
  }

  val lifecycleSql: String =
    s"""WITH weeks AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week FROM events),
       |lagged AS (
       |  SELECT user_id, week,
       |    lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
       |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
       |  FROM weeks),
       |mx AS (SELECT max(week) AS max_week FROM weeks),
       |act AS (
       |  SELECT week,
       |    CASE WHEN prev_week IS NULL THEN 'new'
       |         WHEN week - prev_week = 1 THEN 'returning'
       |         ELSE 'resurrecting' END AS status
       |  FROM lagged),
       |dor AS (
       |  SELECT l.week + 1 AS week, 'dormant' AS status
       |  FROM lagged l, mx
       |  WHERE l.week + 1 <= mx.max_week
       |    AND (l.next_week IS NULL OR l.next_week > l.week + 1))
       |SELECT week, status, count(*) AS n_users
       |FROM (SELECT * FROM act UNION ALL SELECT * FROM dor)
       |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------------- paths

  /** Q-PROD-5: top event-transition edges — for each user's event
    * stream in time order, count (previous event_type → event_type)
    * pairs and keep the 20 heaviest edges (tie-broken by edge name so
    * the cut is deterministic). The PostHog "paths" insight reduced to
    * its aggregate: the edge list that feeds the sankey.
    *
    * Shape at 100 TB: one user-keyed sort window over the compact
    * (user, event_id, type) projection produces every edge locally;
    * edges then aggregate map-side (the edge-type alphabet is tiny) and
    * the top-k is TakeOrderedAndProject — no global sort materializes.
    */
  def paths(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev_type"), col("curr_type"))
      .limit(20)
  }

  val pathsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type AS curr_type, count(*) AS n
      |FROM o WHERE prev_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY n DESC, prev_type, curr_type
      |LIMIT 20""".stripMargin

  /** Q-PROD-24: first-order Markov transition matrix over the event
    * stream — the quantitative twin of [[paths]]: every (from → to)
    * consecutive-event edge with its count, the conditional
    * probability P(to | from) (the edge-weight percentage a paths UI
    * renders), and the edge's rank among `from`'s outgoing edges.
    *
    * Shape at 100 TB: one user-keyed window pass produces the edges,
    * which collapse to a V²-row matrix (V = event-type vocabulary,
    * single digits here) map-side; the row-normalizing totals join and
    * the outgoing-edge rank window both run on that V²-row table —
    * dimension-sized, never the event stream.
    */
  def pathsMarkov(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    markovOver(Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type").as("from_type"), col("event_type").as("to_type")))
  }

  /** The matrix rollup over (from_type, to_type) PAIR rows — shared by
    * the batch form above and the streaming edge emitter
    * (`q_stream_paths`), so the two cannot drift.
    */
  def markovOver(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the V²-row edge table feeds BOTH the totals aggregate
    // and the final join — without it the static plan re-executes the
    // pair derivation (no exchange reuse for a reused intermediate;
    // the q_prod_breakdown precedent). Harness reclaims via
    // Tables.releaseCaches.
    val edges = pairs
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = edges.groupBy(col("from_type")).agg(sum(col("n")).as("out_n"))
    val wr = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type"))
    edges.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("out_n")).as("p"),
        row_number().over(wr).as("out_rank"))
  }

  val pathsMarkovSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
      |  FROM events),
      |edges AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n
      |  FROM o WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n)::BIGINT AS out_n FROM edges GROUP BY 1)
      |SELECT e.from_type, e.to_type, e.n, e.n::DOUBLE / t.out_n AS p,
      |  CAST(row_number() OVER (PARTITION BY e.from_type
      |    ORDER BY e.n DESC, e.to_type) AS INT) AS out_rank
      |FROM edges e JOIN tot t USING (from_type)""".stripMargin

  // ------------------------------------------------------------ stickiness

  private val DayUs = 86400000000L

  /** Q-PROD-6: stickiness histogram — how many users were active on
    * exactly k distinct days over the observed range. Two map-side-
    * combined aggregations over compact pairs: events → distinct
    * (user, day), per-user day counts, then the count-of-counts.
    * Payloads never shuffle; the histogram domain is bounded by the
    * range length regardless of data volume.
    */
  def stickiness(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"))
      .groupBy(col("n_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  val stickinessSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |pu AS (SELECT user_id, count(*) AS n_days FROM days GROUP BY user_id)
       |SELECT n_days, count(*) AS n_users FROM pu GROUP BY 1""".stripMargin

  /** Rolling active-user window length, days. */
  val WauWindow = 7

  /** Q-PROD-7: rolling 7-day active users per day (WAU) — EXACT
    * distinct counts, not sketches. `count(distinct) OVER (RANGE 7
    * days)` doesn't exist in either engine, and per-day
    * `collect_set`-and-merge folds OOM on heavy days; instead each
    * distinct (user, day) contributes itself to the [[WauWindow]] days
    * whose trailing window contains it (a 7-way explode of COMPACT
    * int64 pairs), and one distinct + count per day finishes it.
    *
    * Shape at 100 TB: distinct (user, day) first (map-side combined —
    * output is active-users × days, not events); the explode multiplies
    * only that compact pair set by 7; the final two aggregations
    * shuffle (user, day) int64 pairs. Payloads never move. Days with
    * no activity in the window are absent by definition (count 0).
    */
  def wau(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(col("day"), col("day") + (WauWindow - 1))).as("wday"))
      .select(col("user_id"), col("wday"))
      .distinct()
      .groupBy(col("wday"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("wday").as("day"), col("n_active"))

  val wauSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |win AS (
       |  SELECT DISTINCT user_id, day + off AS wday
       |  FROM days, unnest(generate_series(0, ${WauWindow - 1})) AS o(off))
       |SELECT wday AS day, count(*) AS n_active
       |FROM win GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- sessions

  /** Q-PROD-8: gap-based sessionization — the canonical PostHog
    * session definition (a new session starts after ≥30 min of
    * inactivity). One row per (user, session): event count, start/end
    * epoch micros, duration.
    *
    * Shape at 100 TB: both windows and the final rollup key on
    * `user_id`, so ONE user-keyed shuffle of the compact
    * (user_id, event_id, us) projection serves the whole query; the
    * running `sum` is a per-user streaming pass. All-integer
    * arithmetic, tie-broken by the unique event id ⇒ bit-exact.
    */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Gap-sessionized event rows — THE single definition of the session
    * boundary (30-min gap, (us, event_id) tie-break), shared by
    * [[sessions]] and [[sessionFunnel]] so the rule cannot drift
    * between them (Streaming.sessionize is the third expression of the
    * same definition, pinned equal by StreamingSpec).
    */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), tsUs(col("ts")).as("us"))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .select(col("user_id"), col("session_id"), col("event_id"),
        col("event_type"), col("us"))
  }

  /** DuckDB twin of [[sessionized]]: CTEs ending in `sess`. */
  private val sessionizedCte: String =
    s"""b AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       |f AS (
       |  SELECT user_id, event_id, event_type, us,
       |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > $SessionGapUs
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, us,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id)::BIGINT AS session_id
       |  FROM f)""".stripMargin

  def sessions(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("dur_us"))

  val sessionsSql: String =
    s"""WITH $sessionizedCte
       |SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       |  min(us) AS start_us, max(us) AS end_us, max(us) - min(us) AS dur_us
       |FROM sess GROUP BY user_id, session_id""".stripMargin

  // ------------------------------------------------------------ correlation

  /** Q-PROD-9: funnel correlation (PostHog's correlation analysis):
    * for each candidate event type, how much more likely converted
    * users (those who ever purchased) were to have performed it than
    * non-converted users — the Laplace-smoothed odds ratio
    * `((succ+1)(drop+2)) / ((fail+1)(conv+2))`.
    *
    * All counts are exact distinct-user integers; the odds ratio is a
    * product of int64s with ONE double division at the end ⇒
    * bit-exact. Shape at 100 TB: the (user, event_type) distinct and
    * the converted-user join both key on `user_id` (one partitioning
    * reused); per-type rollup shuffles |event_types| rows; the totals
    * row is a 1-row broadcast.
    */
  def correlation(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val conv = pairs.filter(col("event_type") === "purchase")
      .select(col("user_id")).withColumn("c", lit(1))
    val tot = pairs.select(col("user_id")).distinct()
      .join(conv, Seq("user_id"), "left")
      .agg(sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_conv"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_drop"))
    pairs.filter(col("event_type") =!= "purchase")
      .join(conv, Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_succ"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_fail"))
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_succ"), col("n_fail"),
        col("n_conv"), col("n_drop"),
        (((col("n_succ") + 1) * (col("n_drop") + 2)).cast("double") /
          ((col("n_fail") + 1) * (col("n_conv") + 2))).as("odds_ratio"))
  }

  val correlationSql: String =
    """WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events),
      |conv AS (SELECT DISTINCT user_id FROM pairs WHERE event_type = 'purchase'),
      |tot AS (
      |  SELECT sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_conv,
      |         sum(CASE WHEN c.user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_drop
      |  FROM (SELECT DISTINCT user_id FROM pairs) u
      |  LEFT JOIN conv c USING (user_id)),
      |byt AS (
      |  SELECT event_type,
      |         sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_succ,
      |         sum(CASE WHEN c.user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_fail
      |  FROM pairs p LEFT JOIN conv c USING (user_id)
      |  WHERE p.event_type <> 'purchase' GROUP BY event_type)
      |SELECT event_type, n_succ, n_fail, n_conv, n_drop,
      |  ((n_succ + 1) * (n_drop + 2))::DOUBLE / ((n_fail + 1) * (n_conv + 2)) AS odds_ratio
      |FROM byt, tot""".stripMargin

  /** Q-PROD-10: session-scoped funnel — [[funnel]] with the conversion
    * window bounded by the 30-min-gap session ([[sessions]]): the
    * first view, first click after it, first purchase after that, all
    * within ONE session (PostHog's funnel-with-session-window). One
    * row per session that entered the funnel.
    *
    * Shape at 100 TB: the sessionizing windows and every funnel stage
    * key on `user_id` (+ session_id) — the single user-keyed
    * partitioning is reused by the windows, all three conditional-min
    * rollups and the stage joins; no per-session event arrays.
    */
  def sessionFunnel(s: SparkSession, d: String): DataFrame = {
    val sess = sessionized(s, d)
      .select(col("user_id"), col("session_id"), col("event_id"), col("event_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keys = Seq("user_id", "session_id")
    val s1 = sess.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("session_id")).agg(min(col("event_id")).as("view_eid"))
    val s2 = sess.filter(col("event_type") === "click")
      .join(s1, keys)
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("user_id"), col("session_id")).agg(min(col("event_id")).as("click_eid"))
    val s3 = sess.filter(col("event_type") === "purchase")
      .join(s2, keys)
      .filter(col("event_id") > col("click_eid"))
      .groupBy(col("user_id"), col("session_id")).agg(min(col("event_id")).as("purchase_eid"))
    s1.join(s2, keys, "left")
      .join(s3, keys, "left")
      .select(col("user_id"), col("session_id"),
        col("view_eid"), col("click_eid"), col("purchase_eid"),
        (lit(1) + when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("steps_reached"))
  }

  val sessionFunnelSql: String =
    s"""WITH $sessionizedCte,
       |s1 AS (
       |  SELECT user_id, session_id, min(event_id) AS view_eid
       |  FROM sess WHERE event_type = 'view' GROUP BY user_id, session_id),
       |s2 AS (
       |  SELECT e.user_id, e.session_id, min(e.event_id) AS click_eid
       |  FROM sess e JOIN s1 USING (user_id, session_id)
       |  WHERE e.event_type = 'click' AND e.event_id > s1.view_eid
       |  GROUP BY e.user_id, e.session_id),
       |s3 AS (
       |  SELECT e.user_id, e.session_id, min(e.event_id) AS purchase_eid
       |  FROM sess e JOIN s2 USING (user_id, session_id)
       |  WHERE e.event_type = 'purchase' AND e.event_id > s2.click_eid
       |  GROUP BY e.user_id, e.session_id)
       |SELECT s1.user_id, s1.session_id, s1.view_eid, s2.click_eid, s3.purchase_eid,
       |  (1 + CASE WHEN s2.click_eid IS NOT NULL THEN 1 ELSE 0 END +
       |       CASE WHEN s3.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
       |FROM s1
       |LEFT JOIN s2 USING (user_id, session_id)
       |LEFT JOIN s3 USING (user_id, session_id)""".stripMargin

  /** Q-PROD-11: funnel time-to-convert — the latency distribution
    * between funnel steps ([[funnel]]'s view→click and click→purchase
    * transitions): per step pair, how many users converted and the
    * exact lower-median / p90 / mean of the conversion delay in epoch
    * micros. Counts say WHETHER users convert; this says HOW LONG they
    * take — the number a growth team actually watches after a change.
    *
    * Determinism: delays are int64 micro differences; median is the
    * EXACT rank-`(n+1) div 2` (lower-median) order statistic and p90
    * the rank-`ceil(9n/10)` one (`(9n+9) div 10` — integer arithmetic
    * end to end), tie order (delay, user_id); the mean is one double
    * division of an exact int64 sum.
    *
    * Shape at 100 TB: the funnel's own user-keyed plan, two
    * co-keyed joins back to (user_id, event_id, ts) to fetch step
    * timestamps, a per-step rank window (partitioned by the 2-value
    * step key — at extreme user counts the same order statistics come
    * from the GK/exact-quantile machinery of `q_agg_quantiles`), and a
    * 2-row broadcast of target ranks.
    */
  def funnelTime(s: SparkSession, d: String): DataFrame = {
    val f = funnel(s, d)
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
    val pairs = f.filter(col("click_eid").isNotNull)
      .select(col("user_id"), lit("view_click").as("step"),
        col("view_eid").as("eid_a"), col("click_eid").as("eid_b"))
      .unionByName(
        f.filter(col("purchase_eid").isNotNull)
          .select(col("user_id"), lit("click_purchase").as("step"),
            col("click_eid").as("eid_a"), col("purchase_eid").as("eid_b")))
    val durs = pairs.as("p")
      .join(ev.as("a"), col("p.user_id") === col("a.user_id") && col("p.eid_a") === col("a.event_id"))
      .join(ev.as("b"), col("p.user_id") === col("b.user_id") && col("p.eid_b") === col("b.event_id"))
      .select(col("p.user_id"), col("p.step").as("step"), (col("b.us") - col("a.us")).as("dur_us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val targets = durs.groupBy(col("step")).agg(
        count(lit(1)).as("n"), sum(col("dur_us")).cast(LongType).as("sum_us"))
      .select(col("step"), col("n"), col("sum_us"),
        expr("(n + 1) div 2").cast(LongType).as("rk_med"),
        expr("(9 * n + 9) div 10").cast(LongType).as("rk_p90"))
    val ranked = durs.select(col("step"), col("dur_us"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("step")).orderBy(col("dur_us"), col("user_id")))
        .cast(LongType).as("rk"))
    ranked.join(broadcast(targets), Seq("step"))
      .filter(col("rk") === col("rk_med") || col("rk") === col("rk_p90"))
      .groupBy(col("step")).agg(
        first(col("n")).as("n_users"),
        min(when(col("rk") === col("rk_med"), col("dur_us"))).as("med_us"),
        min(when(col("rk") === col("rk_p90"), col("dur_us"))).as("p90_us"),
        (first(col("sum_us")).cast("double") / first(col("n")).cast("double")).as("mean_us"))
  }

  val funnelTimeSql: String =
    s"""WITH f AS ($funnelSql),
       |ev AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS us FROM events),
       |pairs AS (
       |  SELECT user_id, 'view_click' AS step, view_eid AS eid_a, click_eid AS eid_b
       |  FROM f WHERE click_eid IS NOT NULL
       |  UNION ALL
       |  SELECT user_id, 'click_purchase', click_eid, purchase_eid
       |  FROM f WHERE purchase_eid IS NOT NULL),
       |durs AS (
       |  SELECT p.user_id, p.step, b.us - a.us AS dur_us
       |  FROM pairs p
       |  JOIN ev a ON p.user_id = a.user_id AND p.eid_a = a.event_id
       |  JOIN ev b ON p.user_id = b.user_id AND p.eid_b = b.event_id),
       |t AS (
       |  SELECT step, count(*)::BIGINT AS n, sum(dur_us)::BIGINT AS sum_us,
       |    (count(*) + 1) // 2 AS rk_med, (9 * count(*) + 9) // 10 AS rk_p90
       |  FROM durs GROUP BY step),
       |r AS (
       |  SELECT step, dur_us,
       |    row_number() OVER (PARTITION BY step ORDER BY dur_us, user_id)::BIGINT AS rk
       |  FROM durs)
       |SELECT step, any_value(n)::BIGINT AS n_users,
       |  min(CASE WHEN rk = rk_med THEN dur_us END)::BIGINT AS med_us,
       |  min(CASE WHEN rk = rk_p90 THEN dur_us END)::BIGINT AS p90_us,
       |  any_value(sum_us)::DOUBLE / any_value(n)::DOUBLE AS mean_us
       |FROM r JOIN t USING (step)
       |WHERE rk = rk_med OR rk = rk_p90
       |GROUP BY step""".stripMargin

  // ----------------------------------------------------------------- trends

  /** Q-PROD-12: trends with a formula — PostHog's "insight with
    * formula" shape: two event series rolled up per day (series A =
    * purchase count, series B = unique viewers), zero-filled onto the
    * observed day grid, then per-bucket series arithmetic (A/B ratio
    * and A−B net — the conversion-per-audience readout).
    *
    * Shape at 100 TB: ONE pass over events with conditional aggregates
    * (a single distinct column, so Spark's two-phase distinct planning
    * applies — no Expand; the multi-distinct trap is PlanSpec-banned),
    * producing a V-row (per-day) table; the zero-fill grid derives from
    * a 1-row min/max aggregate exploded to days and broadcasts onto
    * the rollup. The formula is plain column arithmetic on the
    * dimension-sized result — never a second scan, never a self-join
    * of series (k series = k conditional aggregates in the same pass).
    */
  def trends(s: SparkSession, d: String): DataFrame = {
    // persisted: the V-row daily rollup feeds BOTH the grid bounds and
    // the final join — without it the events scan runs twice (no
    // exchange reuse for a reused intermediate in the static plan)
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        countDistinct(when(col("event_type") === "view", col("user_id"))).as("viewers"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    grid.join(daily, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("purchases"), lit(0L)).as("purchases"),
        coalesce(col("viewers"), lit(0L)).as("viewers"))
      // formula columns: guarded division (ANSI mode throws on /0)
      .withColumn("ratio",
        when(col("viewers") === 0, lit(null).cast("double"))
          .otherwise(col("purchases").cast("double") / col("viewers")))
      .withColumn("net", col("purchases") - col("viewers"))
  }

  val trendsSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchases,
      |    count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)::BIGINT AS viewers
      |  FROM events GROUP BY 1),
      |grid AS (
      |  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
      |  FROM daily)
      |SELECT g.day, coalesce(purchases, 0)::BIGINT AS purchases,
      |  coalesce(viewers, 0)::BIGINT AS viewers,
      |  CASE WHEN coalesce(viewers, 0) = 0 THEN NULL
      |       ELSE coalesce(purchases, 0)::DOUBLE / viewers END AS ratio,
      |  coalesce(purchases, 0) - coalesce(viewers, 0) AS net
      |FROM grid g LEFT JOIN daily USING (day)""".stripMargin

  /** Q-PROD-13: trends BREAKDOWN with top-N election — PostHog's
    * "breakdown by property" insight, which never returns the raw
    * breakdown cardinality: the top [[BreakdownTopK]] values by total
    * volume keep their own series, everything else lumps into
    * `$$_other`. The lump is the scale guard — a breakdown over a
    * high-cardinality property (URL, UTM term) would otherwise emit
    * millions of series.
    *
    * Shape at 100 TB: ONE events shuffle to the (day × value) rollup
    * (map-side combined); the election runs over the value DIMENSION
    * (`TakeOrderedAndProject`, k rows cross the network) and
    * broadcasts back onto the rollup; the lump re-aggregate is
    * dimension-sized. Raw events are touched exactly once.
    */
  val BreakdownTopK = 8

  def breakdown(s: SparkSession, d: String): DataFrame = {
    // the (day × value) rollup feeds BOTH the election and the final
    // series — persist the dimension-sized table so the events scan
    // happens once (static planning does not reuse the exchange here;
    // Tables.releaseCaches reclaims the blocks after execution)
    val rolled = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").as("bval"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NULL breakdown values never win a series: they can't match the
    // election join anyway (null never equi-joins), and Spark's
    // tie-break sorts nulls FIRST while DuckDB's ORDER BY sorts them
    // LAST — leaving NULL in the election would waste a top-K slot and
    // diverge from the oracle on an exact tie at the boundary.
    val top = rolled.filter(col("bval").isNotNull)
      .groupBy(col("bval")).agg(sum(col("n")).as("total"))
      .orderBy(col("total").desc, col("bval"))
      .limit(BreakdownTopK)
      .select(col("bval"), lit(true).as("kept"))
    rolled.join(broadcast(top), Seq("bval"), "left")
      .withColumn("series",
        when(col("kept").isNotNull, col("bval")).otherwise(lit("$$_other")))
      .groupBy(col("day"), col("series"))
      .agg(sum(col("n")).as("n"))
  }

  /** Q-PROD-21: trends with breakdown AND formula composed — PostHog
    * lets one insight carry both: every elected breakdown value gets
    * its own zero-filled daily series of BOTH metrics (purchase count
    * + unique viewers), with the formula (ratio, net) applied per
    * (day, series) bucket. Composes [[trends]]' formula/zero-fill
    * machinery with [[breakdown]]'s top-N election + `$$_other` lump.
    *
    * The lump would DOUBLE-COUNT the distinct-viewers metric if it
    * re-aggregated per-value distinct counts, so the one events pass
    * lands at (day, value, user) grain first: the election sums event
    * volume from that grain, and the lumped re-aggregate runs its
    * single countDistinct over users (two-phase distinct planning —
    * one distinct column, no Expand).
    *
    * Shape at 100 TB: events shuffle ONCE (map-side combined) to the
    * user-grain rollup — bounded by daily-active × values-per-user,
    * orders of magnitude under raw events; the election is
    * `TakeOrderedAndProject` over the value dimension; the day × series
    * zero-fill grid is a 1-row min/max agg exploded and broadcast.
    */
  def trendsBreakdown(s: SparkSession, d: String): DataFrame = {
    val userGrain = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").as("bval"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        max(when(col("event_type") === "view", true).otherwise(false)).as("viewed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = userGrain.filter(col("bval").isNotNull)
      .groupBy(col("bval")).agg(sum(col("n_events")).as("total"))
      .orderBy(col("total").desc, col("bval"))
      .limit(BreakdownTopK)
      .select(col("bval"), lit(true).as("kept"))
    val series = userGrain.join(broadcast(top), Seq("bval"), "left")
      .withColumn("series",
        when(col("kept").isNotNull, col("bval")).otherwise(lit("$$_other")))
      .groupBy(col("day"), col("series"))
      .agg(
        sum(col("purchases")).as("purchases"),
        countDistinct(when(col("viewed"), col("user_id"))).as("viewers"))
    // zero-fill: every elected series (plus the lump, if present)
    // spans the full observed day grid
    val days = series.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val grid = days.crossJoin(broadcast(series.select(col("series")).distinct()))
    grid.join(series, Seq("day", "series"), "left")
      .select(col("day"), col("series"),
        coalesce(col("purchases"), lit(0L)).as("purchases"),
        coalesce(col("viewers"), lit(0L)).as("viewers"))
      .withColumn("ratio",
        when(col("viewers") === 0, lit(null).cast("double"))
          .otherwise(col("purchases").cast("double") / col("viewers")))
      .withColumn("net", col("purchases") - col("viewers"))
  }

  val trendsBreakdownSql: String =
    s"""WITH ug AS (
       |  SELECT CAST(ts AS DATE) AS day, json_extract_string(props, '$$.k') AS bval,
       |    user_id, count(*)::BIGINT AS n_events,
       |    count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS purchases,
       |    bool_or(event_type = 'view') AS viewed
       |  FROM events GROUP BY 1, 2, 3),
       |top AS (
       |  SELECT bval FROM (
       |    SELECT bval, sum(n_events) AS total FROM ug WHERE bval IS NOT NULL GROUP BY 1
       |    ORDER BY total DESC, bval LIMIT $BreakdownTopK)),
       |ser AS (
       |  SELECT day,
       |    CASE WHEN bval IN (SELECT bval FROM top) THEN bval ELSE '$$$$_other' END AS series,
       |    sum(purchases)::BIGINT AS purchases,
       |    count(DISTINCT CASE WHEN viewed THEN user_id END)::BIGINT AS viewers
       |  FROM ug GROUP BY 1, 2),
       |grid AS (
       |  SELECT d.day, s.series
       |  FROM (SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
       |        FROM ser) d
       |  CROSS JOIN (SELECT DISTINCT series FROM ser) s)
       |SELECT g.day, g.series,
       |  coalesce(purchases, 0)::BIGINT AS purchases,
       |  coalesce(viewers, 0)::BIGINT AS viewers,
       |  CASE WHEN coalesce(viewers, 0) = 0 THEN NULL
       |       ELSE coalesce(purchases, 0)::DOUBLE / viewers END AS ratio,
       |  coalesce(purchases, 0) - coalesce(viewers, 0) AS net
       |FROM grid g LEFT JOIN ser USING (day, series)""".stripMargin

  val breakdownSql: String =
    s"""WITH rolled AS (
       |  SELECT CAST(ts AS DATE) AS day, json_extract_string(props, '$$.k') AS bval,
       |    count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |top AS (
       |  SELECT bval FROM (
       |    SELECT bval, sum(n) AS total FROM rolled WHERE bval IS NOT NULL GROUP BY 1
       |    ORDER BY total DESC, bval LIMIT $BreakdownTopK))
       |SELECT day,
       |  CASE WHEN bval IN (SELECT bval FROM top) THEN bval ELSE '$$$$_other' END AS series,
       |  sum(n)::BIGINT AS n
       |FROM rolled GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- funnel ordering modes

  /** Q-PROD-16: STRICT-ORDER funnel — PostHog's "strict" funnel mode:
    * a step counts only when its event is the user's IMMEDIATELY next
    * event after the previous step's event (any intervening event of
    * any type breaks the sequence). The per-user depth is the maximum
    * over all candidate sequences, which for strict mode reduces to
    * "does any consecutive (view), (view,click), (view,click,purchase)
    * run exist in the user's event-id order" — two `lead`s over the
    * user window and three conditional minima. One row per user who
    * ever viewed; `sN_eid` anchors the EARLIEST run of depth ≥ N.
    *
    * Shape at 100 TB: a single user-partitioned window (the
    * per-user event sequence is the partition — no global sort), then
    * a map-side-combined aggregate on the same user hash partitioning;
    * events shuffle exactly once. Integer-only output.
    */
  def funnelStrict(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("event_id"))).as("s1_eid"),
        min(when(col("event_type") === "view" && col("t1") === "click",
          col("event_id"))).as("s2_eid"),
        min(when(col("event_type") === "view" && col("t1") === "click" &&
          col("t2") === "purchase", col("event_id"))).as("s3_eid"))
      .filter(col("s1_eid").isNotNull)
      .withColumn("steps_reached",
        (lit(1) + when(col("s2_eid").isNotNull, 1).otherwise(0) +
          when(col("s3_eid").isNotNull, 1).otherwise(0)).cast(IntegerType))
  }

  val funnelStrictSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
      |SELECT user_id,
      |  min(CASE WHEN event_type = 'view' THEN event_id END) AS s1_eid,
      |  min(CASE WHEN event_type = 'view' AND t1 = 'click'
      |           THEN event_id END) AS s2_eid,
      |  min(CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      |           THEN event_id END) AS s3_eid,
      |  (1 + CASE WHEN min(CASE WHEN event_type = 'view' AND t1 = 'click'
      |                 THEN event_id END) IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN min(CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      |                 THEN event_id END) IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
      |FROM seq GROUP BY user_id
      |HAVING min(CASE WHEN event_type = 'view' THEN event_id END) IS NOT NULL""".stripMargin

  /** Q-PROD-17: UNORDERED funnel — PostHog's "any order" mode: the
    * user completes step N when N distinct funnel step types have been
    * seen, in any order. Per user: the first event of each step type,
    * how many types are present, and the completion anchor (the event
    * at which the LAST missing type arrived — `greatest` of the three
    * first-occurrence ids) when all three are present.
    *
    * Shape at 100 TB: one conditional-min aggregate over the user key —
    * no window, no join; a single shuffle with map-side partials.
    */
  def funnelUnordered(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("event_id"))).as("view_eid"),
        min(when(col("event_type") === "click", col("event_id"))).as("click_eid"),
        min(when(col("event_type") === "purchase", col("event_id"))).as("purchase_eid"))
      .filter(
        col("view_eid").isNotNull || col("click_eid").isNotNull ||
          col("purchase_eid").isNotNull)
      .withColumn("steps_present",
        (when(col("view_eid").isNotNull, 1).otherwise(0) +
          when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0)).cast(IntegerType))
      .withColumn("completed_eid",
        when(col("steps_present") === 3,
          greatest(col("view_eid"), col("click_eid"), col("purchase_eid"))))

  val funnelUnorderedSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN event_id END) AS view_eid,
      |    min(CASE WHEN event_type = 'click' THEN event_id END) AS click_eid,
      |    min(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase_eid
      |  FROM events GROUP BY user_id)
      |SELECT user_id, view_eid, click_eid, purchase_eid,
      |  (CASE WHEN view_eid IS NOT NULL THEN 1 ELSE 0 END
      |   + CASE WHEN click_eid IS NOT NULL THEN 1 ELSE 0 END
      |   + CASE WHEN purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_present,
      |  CASE WHEN view_eid IS NOT NULL AND click_eid IS NOT NULL
      |            AND purchase_eid IS NOT NULL
      |       THEN greatest(view_eid, click_eid, purchase_eid) END AS completed_eid
      |FROM f
      |WHERE view_eid IS NOT NULL OR click_eid IS NOT NULL
      |   OR purchase_eid IS NOT NULL""".stripMargin

  /** Q-PROD-18: first-time-for-user trends — PostHog's "first time for
    * user" series math: per day, how many users performed a `click`
    * for the FIRST time ever that day, beside the day's total distinct
    * clicking users (the plain "unique users" series for contrast).
    *
    * Shape at 100 TB: the (user, day) pairs deduplicate map-side
    * before any shuffle; the first-day dimension is a per-user min on
    * the same user partitioning; the final day rollup is
    * dimension-sized. No window, no self-join over raw events.
    */
  def firstTime(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .filter(col("event_type") === "click")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val firstDay = days.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    days.join(firstDay, Seq("user_id"))
      .groupBy(col("day"))
      .agg(
        count(when(col("day") === col("first_day"), 1)).as("first_time_users"),
        count(lit(1)).as("active_users"))
  }

  val firstTimeSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events WHERE event_type = 'click'),
      |fd AS (SELECT user_id, min(day) AS first_day FROM days GROUP BY user_id)
      |SELECT day,
      |  count(*) FILTER (WHERE day = first_day)::BIGINT AS first_time_users,
      |  count(*)::BIGINT AS active_users
      |FROM days JOIN fd USING (user_id)
      |GROUP BY day""".stripMargin

  /** Q-PROD-19: funnel with an EXCLUSION event — PostHog's funnel
    * exclusions: a user who fires the exclusion event (`error`)
    * strictly between two completed funnel steps is disqualified.
    * Users who never entered a step PAIR (depth 1) have no
    * between-steps range and cannot be excluded. The row set is
    * [[funnel]]'s with an `excluded` verdict per user — dashboards
    * report both the cleaned counts and how many were excluded.
    *
    * Shape at 100 TB: [[funnel]]'s single reused user-hash
    * partitioning plus ONE more user-keyed stage: the error events
    * join the (dimension-sized, one-row-per-user) anchor table, the
    * in-range test is a filter, and the exclusion set semi-joins
    * back. Raw events still shuffle exactly once per step type.
    */
  def funnelExcl(s: SparkSession, d: String): DataFrame = {
    val f = funnel(s, d)
    val anchors = f.filter(col("click_eid").isNotNull)
      .select(col("user_id"), col("view_eid"),
        coalesce(col("purchase_eid"), col("click_eid")).as("last_eid"))
    val excluded = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"))
      .join(anchors, Seq("user_id"))
      .filter(col("event_id") > col("view_eid") && col("event_id") < col("last_eid"))
      .select(col("user_id")).distinct()
      .withColumn("hit", lit(true))
    f.join(excluded, Seq("user_id"), "left")
      .select(col("user_id"), col("view_eid"), col("click_eid"),
        col("purchase_eid"), col("steps_reached"),
        coalesce(col("hit"), lit(false)).as("excluded"))
  }

  val funnelExclSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(event_id) AS view_eid
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.event_id) AS click_eid
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.event_id > s1.view_eid
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.event_id) AS purchase_eid
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.event_id > s2.click_eid
      |  GROUP BY e.user_id),
      |f AS (
      |  SELECT s1.user_id, s1.view_eid, s2.click_eid, s3.purchase_eid,
      |    (1 + CASE WHEN s2.click_eid IS NOT NULL THEN 1 ELSE 0 END
      |       + CASE WHEN s3.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
      |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)),
      |ex AS (
      |  SELECT DISTINCT e.user_id
      |  FROM events e JOIN f USING (user_id)
      |  WHERE e.event_type = 'error' AND f.click_eid IS NOT NULL
      |    AND e.event_id > f.view_eid
      |    AND e.event_id < coalesce(f.purchase_eid, f.click_eid))
      |SELECT f.user_id, f.view_eid, f.click_eid, f.purchase_eid, f.steps_reached,
      |  (ex.user_id IS NOT NULL) AS excluded
      |FROM f LEFT JOIN ex USING (user_id)""".stripMargin

  /** Conversion window for [[funnelWindow]]: the whole funnel must
    * complete within 2 days of the anchoring view. */
  val ConvWindowUs: Long = 2 * DayUs

  /** Q-PROD-20: funnel with a CONVERSION WINDOW — PostHog funnels
    * count a step only when it lands within the conversion window of
    * the user's anchoring first step (default 14 days; 2 days here so
    * the 30-day fixture actually censors some conversions). Anchors
    * are ts-bounded AND id-ordered: the first click after the view
    * and within the window, then the first purchase after that click
    * and within the same view-anchored window.
    *
    * Shape at 100 TB: identical to [[funnel]] — three conditional-min
    * aggregations joined on the one reused user-hash partitioning;
    * the window bound is a filter beside the order bound, costing
    * nothing extra. Integer micros only.
    */
  def funnelWindow(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
    // the anchor's OWN timestamp rides along in the same aggregate
    // (min_by on the unique event_id — no second scan for the anchor row)
    val s1t = base.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("event_id")).as("view_eid"),
        expr("min_by(us, event_id)").as("view_us"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1t, Seq("user_id"))
      .filter(col("event_id") > col("view_eid") &&
        col("us") <= col("view_us") + ConvWindowUs)
      .groupBy(col("user_id")).agg(min(col("event_id")).as("click_eid"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(s1t.join(s2, Seq("user_id")), Seq("user_id"))
      .filter(col("event_id") > col("click_eid") &&
        col("us") <= col("view_us") + ConvWindowUs)
      .groupBy(col("user_id")).agg(min(col("event_id")).as("purchase_eid"))
    s1t.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("view_eid"), col("click_eid"), col("purchase_eid"),
        (lit(1) + when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("steps_reached"))
  }

  val funnelWindowSql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, min(event_id) AS view_eid
       |  FROM events WHERE event_type = 'view' GROUP BY user_id),
       |s1t AS (
       |  SELECT s1.user_id, s1.view_eid, epoch_us(e.ts) AS view_us
       |  FROM s1 JOIN events e ON e.user_id = s1.user_id AND e.event_id = s1.view_eid),
       |s2 AS (
       |  SELECT e.user_id, min(e.event_id) AS click_eid
       |  FROM events e JOIN s1t USING (user_id)
       |  WHERE e.event_type = 'click' AND e.event_id > s1t.view_eid
       |    AND epoch_us(e.ts) <= s1t.view_us + $ConvWindowUs
       |  GROUP BY e.user_id),
       |s3 AS (
       |  SELECT e.user_id, min(e.event_id) AS purchase_eid
       |  FROM events e JOIN s1t USING (user_id) JOIN s2 USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.event_id > s2.click_eid
       |    AND epoch_us(e.ts) <= s1t.view_us + $ConvWindowUs
       |  GROUP BY e.user_id)
       |SELECT s1t.user_id, s1t.view_eid, s2.click_eid, s3.purchase_eid,
       |  (1 + CASE WHEN s2.click_eid IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN s3.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
       |FROM s1t LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin

  /** Q-PROD-22: ANCHORED paths with dropoff — PostHog's paths insight
    * with a start point: from each user's FIRST `signup`, the types of
    * the next three events form the user's path; paths aggregate to
    * (path, depth, n_users) and the 30 heaviest are kept
    * (deterministic tie-break on the path string). Users whose anchor
    * is their last event show as the bare "signup" path — that row IS
    * the dropoff-at-start count.
    *
    * Shape at 100 TB: both windows (the 3-step lookahead and the
    * first-anchor row_number) partition by `user_id`, so the compact
    * (user, id, type) projection shuffles ONCE and the two sorts run
    * on the same exchange; path strings aggregate map-side (the
    * alphabet is tiny) and the top-k is TakeOrderedAndProject.
    */
  def pathsAnchored(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("t3", lead(col("event_type"), 3).over(w))
      .filter(col("event_type") === "signup")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        concat_ws(">", lit("signup"), col("t1"), col("t2"), col("t3")).as("path"),
        (lit(1) + when(col("t1").isNotNull, 1).otherwise(0) +
          when(col("t2").isNotNull, 1).otherwise(0) +
          when(col("t3").isNotNull, 1).otherwise(0)).cast(IntegerType).as("depth"))
      .groupBy(col("path"), col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(30)
  }

  val pathsAnchoredSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(event_type, 3) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
      |anch AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM seq WHERE event_type = 'signup')
      |SELECT concat_ws('>', 'signup', t1, t2, t3) AS path,
      |  (1 + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)::INT AS depth,
      |  count(*) AS n_users
      |FROM anch WHERE rn = 1
      |GROUP BY 1, 2
      |ORDER BY n_users DESC, path
      |LIMIT 30""".stripMargin

  /** Q-PROD-23: rolling WAU from MERGEABLE SKETCHES — the 100 TB form
    * of [[wau]]: per-day HLL sketches (built once; in production
    * persisted to the lake as binary columns) roll up to any trailing
    * window by UNION — no rescan of raw events, no per-window distinct
    * over (user, day) pairs. The estimate can't hash-match an exact
    * oracle, so each day's estimate is gated IN-ROW against the exact
    * [[wau]] twin (default lgConfigK=12 → ~1.6 % rse; union of ≤7
    * sketches stays well inside the 5 % gate) and the driver checks
    * exact columns plus the boolean verdict.
    *
    * Shape at 100 TB: one pass over events builds the day-keyed
    * sketch table (map-side partial HLL merge); the 7-way explode
    * multiplies only the ~KB day-dimension sketch rows; the union agg
    * shuffles day-keyed sketches. The exact twin joins day-on-day
    * (dimension-sized).
    */
  def wauSketch(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(expr(s"unix_micros(ts) DIV $DayUs").as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val rolled = daily
      .select(explode(sequence(col("day"), col("day") + (WauWindow - 1))).as("day"),
        col("sk"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_active"))
    wau(s, d).join(rolled, Seq("day"))
      .select(col("day"), col("n_active"),
        (abs(col("est_active") - col("n_active")) <=
          col("n_active") * lit(0.05)).as("est_within_5pct"))
  }

  val wauSketchSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |win AS (
       |  SELECT DISTINCT user_id, day + off AS wday
       |  FROM days, unnest(generate_series(0, ${WauWindow - 1})) AS o(off))
       |SELECT wday AS day, count(*) AS n_active, TRUE AS est_within_5pct
       |FROM win GROUP BY 1""".stripMargin

  /** Q-PROD-24: retention with SEPARATE target and returning events —
    * PostHog's full retention config: the cohort is the week of a
    * user's FIRST `signup` (the target event), and a cell counts users
    * with a `purchase` (the returning event) in the offset week.
    * Offset 0 rows count same-week purchasers, not the cohort size —
    * the cohort size is its own column so the triangle normalizes.
    *
    * Shape at 100 TB: same as [[retention]] — both event streams
    * reduce to distinct (user, week) pairs map-side before any join;
    * the cohort dimension joins user-keyed; negative offsets
    * (purchases before first signup) are dropped like PostHog does.
    */
  def retentionTarget(s: SparkSession, d: String): DataFrame = {
    val cohort = Tables.events(s, d)
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(expr(s"min(unix_micros(ts) DIV $WeekUs)").as("cohort_week"))
    val returning = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
      .distinct()
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    returning.join(cohort, Seq("user_id"))
      .filter(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_returned"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
        col("n_returned"))
  }

  val retentionTargetSql: String =
    s"""WITH cohort AS (
       |  SELECT user_id, min(epoch_us(ts) // $WeekUs) AS cohort_week
       |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
       |ret AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS week
       |  FROM events WHERE event_type = 'purchase'),
       |sizes AS (
       |  SELECT cohort_week, count(*) AS cohort_users FROM cohort GROUP BY 1),
       |cells AS (
       |  SELECT c.cohort_week, r.week - c.cohort_week AS week_offset,
       |    count(*) AS n_returned
       |  FROM ret r JOIN cohort c USING (user_id)
       |  WHERE r.week >= c.cohort_week
       |  GROUP BY 1, 2)
       |SELECT cohort_week, week_offset, cohort_users, n_returned
       |FROM cells JOIN sizes USING (cohort_week)""".stripMargin

  /** Membership bar for [[cohortTrends]]'s behavioral cohort. */
  val CohortMinPurchases = 3

  /** Q-PROD-25: insight FILTERED BY A BEHAVIORAL COHORT — PostHog's
    * "filter by cohort" on any insight: the cohort is computed from
    * behavior (users with ≥ [[CohortMinPurchases]] purchases ever),
    * then the daily `view` trend runs over cohort members only, with
    * the cohort size and the day's member-distinct count beside the
    * raw volume.
    *
    * Shape at 100 TB: the cohort materializes as a user-keyed
    * DIMENSION (one aggregate over the compact (user, type)
    * projection); the trend side semi-joins events to it on the same
    * user-hash partitioning before the day rollup — events shuffle
    * once, and the filter cuts them before any day-level state.
    */
  def cohortTrends(s: SparkSession, d: String): DataFrame = {
    val members = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("np"))
      .filter(col("np") >= CohortMinPurchases)
      .select(col("user_id"))
    val size = members.agg(count(lit(1)).as("cohort_users"))
    Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .join(members, Seq("user_id"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_views"),
        countDistinct(col("user_id")).as("n_members_active"))
      .crossJoin(size)
  }

  val cohortTrendsSql: String =
    s"""WITH members AS (
       |  SELECT user_id FROM events WHERE event_type = 'purchase'
       |  GROUP BY user_id HAVING count(*) >= $CohortMinPurchases),
       |sz AS (SELECT count(*) AS cohort_users FROM members)
       |SELECT CAST(e.ts AS DATE) AS day, count(*) AS n_views,
       |  count(DISTINCT e.user_id) AS n_members_active, sz.cohort_users
       |FROM events e JOIN members USING (user_id) CROSS JOIN sz
       |WHERE e.event_type = 'view'
       |GROUP BY 1, sz.cohort_users""".stripMargin

  // ------------------------------------------------- cumulative trends

  /** Q-PROD-23: CUMULATIVE trends — PostHog's "cumulative" display
    * mode: the daily series summed forward, per breakdown segment
    * (`props.k % 10`), so each point answers "how many event-units so
    * far". Emits both the daily value and the running total.
    *
    * Shape at 100 TB: the events scan collapses to a (day × 10)-row
    * dimension aggregate FIRST (map-side combined), and the running
    * sum is a window over that tiny rollup, partitioned by segment —
    * never a window over raw events. The cumulation cost is
    * O(days × segments) regardless of corpus size.
    */
  def trendsCumulative(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rolled = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .groupBy(to_date(col("ts")).as("day"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("bval"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bval")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rolled.withColumn("cum_n", sum(col("n")).over(w))
  }

  val trendsCumulativeSql: String =
    """WITH rolled AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    json_extract_string(props, '$.k')::INT % 10 AS bval,
      |    count(*) AS n
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT day, bval, n,
      |  CAST(sum(n) OVER (PARTITION BY bval ORDER BY day) AS BIGINT) AS cum_n
      |FROM rolled""".stripMargin

  /** Q-PROD-25: trends COMPARED to the previous period — PostHog's
    * `compare: true` insight: the observed day grid splits into the
    * current period (its last ⌊n/2⌋ days) and the equal-length period
    * immediately before it; each current-period day pairs with the
    * previous-period day at the same offset, with the absolute delta
    * and the guarded percent change.
    *
    * Shape at 100 TB: one map-side-combined daily rollup of the event
    * stream; the grid/period arithmetic and the offset pivot all run on
    * the V-row (per-day) table — a 1-row bounds aggregate broadcast
    * onto it, no window, no series self-join, raw events scanned once.
    */
  def trendsCompare(s: SparkSession, d: String): DataFrame = {
    // persisted: the V-row daily rollup feeds BOTH the bounds aggregate
    // and the grid join — without it the events scan runs twice (no
    // exchange reuse for a reused intermediate in the static plan)
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"), col("lo"), col("hi"))
    val tagged = grid.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        datediff(col("day"), col("lo")).as("idx"),
        (datediff(col("hi"), col("lo")) + 1).as("ndays"))
      .withColumn("half", expr("ndays div 2"))
      .withColumn("cur", col("idx") >= col("ndays") - col("half"))
      .withColumn("slot",
        when(col("cur"), col("idx") - (col("ndays") - col("half")))
          .when(col("idx") >= col("ndays") - col("half") * 2,
            col("idx") - (col("ndays") - col("half") * 2)))
      .filter(col("slot").isNotNull)
    tagged.groupBy(col("slot"))
      .agg(
        max(when(col("cur"), col("day"))).as("day"),
        max(when(col("cur"), col("n"))).as("n_cur"),
        max(when(!col("cur"), col("n"))).as("n_prev"))
      .withColumn("delta", col("n_cur") - col("n_prev"))
      .withColumn("pct_change",
        when(col("n_prev") === 0, lit(null).cast("double"))
          .otherwise(col("n_cur").cast("double") / col("n_prev") - 1))
  }

  val trendsCompareSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |grid AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day, lo, hi
      |  FROM b),
      |f AS (
      |  SELECT g.day, coalesce(d.n, 0)::BIGINT AS n,
      |    datediff('day', g.lo, g.day) AS idx,
      |    datediff('day', g.lo, g.hi) + 1 AS ndays
      |  FROM grid g LEFT JOIN daily d USING (day)),
      |t AS (SELECT *, ndays // 2 AS half FROM f),
      |o AS (
      |  SELECT day, n, idx >= ndays - half AS cur,
      |    CASE WHEN idx >= ndays - half THEN idx - (ndays - half)
      |         WHEN idx >= ndays - 2 * half THEN idx - (ndays - 2 * half)
      |    END AS slot
      |  FROM t),
      |p AS (
      |  SELECT slot::INT AS slot,
      |    max(CASE WHEN cur THEN day END) AS day,
      |    max(CASE WHEN cur THEN n END)::BIGINT AS n_cur,
      |    max(CASE WHEN NOT cur THEN n END)::BIGINT AS n_prev
      |  FROM o WHERE slot IS NOT NULL GROUP BY 1)
      |SELECT slot, day, n_cur, n_prev, n_cur - n_prev AS delta,
      |  CASE WHEN n_prev = 0 THEN NULL
      |       ELSE n_cur::DOUBLE / n_prev - 1 END AS pct_change
      |FROM p""".stripMargin

  // ------------------------------------------------- funnel breakdown

  /** Q-PROD-22: funnel with BREAKDOWN — PostHog's funnel split by a
    * property: each user's whole funnel is attributed to ONE breakdown
    * value (first-touch: the property on the view event that anchors
    * the funnel — PostHog's `breakdown_attribution_type: first_touch`),
    * then per-value entered/step/converted counts and the end-to-end
    * conversion rate. The property here is `props.k` bucketed mod 10
    * (a ~10-ary segment, the shape of a browser/plan/country split).
    *
    * Shape at 100 TB: the per-user funnel fold is [[funnel]] verbatim
    * (three user-keyed min-aggregates, one user-hash shuffle reused
    * across steps); the anchor's breakdown value rides the SAME s1
    * aggregate as a `min_by` (no extra shuffle, no second scan), and
    * the final rollup is a 10-row map-side-combined aggregate. The
    * conversion divide is one double op on integer counts — exact.
    */
  def funnelBreakdown(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), col("props"))
    val s1 = base.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("event_id")).as("view_eid"),
        min_by(get_json_object(col("props"), "$.k").cast("int") % 10,
          col("event_id")).as("bval"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1.select("user_id", "view_eid"), Seq("user_id"))
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("click_eid"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("event_id") > col("click_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("purchase_eid"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .groupBy(col("bval"))
      .agg(count(lit(1)).as("entered"),
        count(col("click_eid")).as("step2"),
        count(col("purchase_eid")).as("converted"))
      .withColumn("conversion",
        col("converted").cast("double") / col("entered"))
  }

  val funnelBreakdownSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(event_id) AS view_eid,
      |    min_by(json_extract_string(props, '$.k')::INT % 10, event_id) AS bval
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.event_id) AS click_eid
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.event_id > s1.view_eid
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.event_id) AS purchase_eid
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.event_id > s2.click_eid
      |  GROUP BY e.user_id)
      |SELECT s1.bval, count(*) AS entered,
      |  count(s2.click_eid) AS step2,
      |  count(s3.purchase_eid) AS converted,
      |  count(s3.purchase_eid)::DOUBLE / count(*) AS conversion
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
      |GROUP BY s1.bval""".stripMargin

  /** Q-PROD-33: SAMPLED trends with Horvitz–Thompson correction —
    * PostHog's "sampling factor" insight: run the daily series on a
    * deterministic 1-in-[[SampleMod]] PERSON sample (sampling by
    * person, not by event, keeps each kept user's event structure
    * intact — distinct-user estimates stay unbiased) and inflate
    * counts by the inverse inclusion probability. Exact full-table
    * twin columns ride in-row as the accuracy audit (the established
    * sketch-twin pattern) — at 100 TB only the sampled branch runs;
    * the twin is the test-scale gate that the estimator is wired
    * right, not part of the serving plan.
    *
    * Shape at 100 TB: the sample predicate is a cheap arithmetic
    * filter evaluated at the scan, so only ~1/[[SampleMod]] of the
    * events reach the rollup shuffle — the whole point of sampled
    * insights. All arithmetic is integer-exact (counts × a literal).
    */
  val SampleMod = 10

  def trendsSampled(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val sampled = e.filter(col("user_id") % SampleMod === 3)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("user_id")).as("u_sampled"))
    val exact = e.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("exact_events"),
        countDistinct(col("user_id")).as("exact_users"))
    // both sides are day-dimension-sized; the join is trivial. Outer
    // on the exact side: a day can lose every event to the sample.
    exact.join(sampled, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        (coalesce(col("n_sampled"), lit(0L)) * SampleMod).as("est_events"),
        (coalesce(col("u_sampled"), lit(0L)) * SampleMod).as("est_users"),
        col("exact_events"), col("exact_users"))
  }

  val trendsSampledSql: String =
    s"""WITH sampled AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_sampled,
       |    count(DISTINCT user_id)::BIGINT AS u_sampled
       |  FROM events WHERE user_id % $SampleMod = 3 GROUP BY 1),
       |exact AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS exact_events,
       |    count(DISTINCT user_id)::BIGINT AS exact_users
       |  FROM events GROUP BY 1)
       |SELECT e.day, coalesce(n_sampled, 0)::BIGINT AS n_sampled,
       |  (coalesce(n_sampled, 0) * $SampleMod)::BIGINT AS est_events,
       |  (coalesce(u_sampled, 0) * $SampleMod)::BIGINT AS est_users,
       |  exact_events, exact_users
       |FROM exact e LEFT JOIN sampled USING (day)""".stripMargin

  /** Q-PROD-34: trends aggregated by UNIQUE GROUPS — PostHog group
    * analytics ("how many organizations did X this week"): the weekly
    * series counts distinct group-slot values instead of distinct
    * persons, with the event→group attribution coming through the
    * REAL P10 slot-mapping pipe ([[graft.ingest.IngestQueries
    * .groupAttribution]] — `$groups` pivoted into positional columns,
    * itself oracle-pinned by `q_ingest_groups`). Emits both the
    * company (slot 0) and team (slot 1) unique counts beside the
    * person count the standard insight would report.
    *
    * Shape at 100 TB: the attribution join is event-keyed on the
    * event-id primary key (co-partitioned, or bucket-eligible when
    * the canonical table lands bucketed — `Lake.writeBucketed`); the
    * rollup is one map-side-combined shuffle to the (week ×
    * event_type) dimension.
    */
  def trendsGroups(s: SparkSession, d: String): DataFrame = {
    val ga = graft.ingest.IngestQueries.groupAttribution(s, d)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .join(ga, Seq("event_id"))
      .groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("group0")).as("u_companies"),
        countDistinct(col("group1")).as("u_teams"),
        countDistinct(col("user_id")).as("u_users"))
  }

  val trendsGroupsSql: String =
    s"""WITH ga AS (${graft.ingest.IngestQueries.groupAttributionSql})
       |SELECT date_trunc('week', e.ts)::DATE AS week, e.event_type,
       |  count(*)::BIGINT AS n_events,
       |  count(DISTINCT ga.group0)::BIGINT AS u_companies,
       |  count(DISTINCT ga.group1)::BIGINT AS u_teams,
       |  count(DISTINCT e.user_id)::BIGINT AS u_users
       |FROM events e JOIN ga USING (event_id)
       |GROUP BY 1, 2""".stripMargin

  /** Q-PROD-35: INCREMENTAL trends maintenance (IVM) — the pattern a
    * 100 TB daily-series dashboard actually runs: never rescan
    * history; merge yesterday's materialized rollup with today's
    * arrival delta. Plain counts merge by addition; DISTINCT USERS do
    * not — the maintained state is the (day × user) FIRST-SEEN pairs
    * table, and the delta's contribution is its pairs anti-joined
    * against the state (new pairs only). Emits per day: history/delta
    * rows, history distinct users, NEW users from the delta, the
    * merged distinct count, and the in-row gate that the incremental
    * merge equals the full recompute (the full-recompute columns are
    * the test-scale audit twin — at 100 TB only the delta branch and
    * the pairs-table upsert run).
    *
    * The history/delta split is the time-monotone event-id midpoint
    * (at scale: the ingestion-date partition boundary).
    *
    * Shape at 100 TB: the delta is partition-pruned at the scan; the
    * anti-join keys on (day, user) — the same key as the pairs
    * table's distinct, so ONE hash partitioning serves dedup + join
    * (bucket the pairs table on user and the exchange disappears);
    * rollups are day-dimension-sized.
    */
  def trendsIncremental(s: SparkSession, d: String): DataFrame =
    trendsIncrementalAt(s, d, 0.5)

  /** [[trendsIncremental]] at an arbitrary split fraction (see
    * [[funnelIncrementalAt]]).
    */
  private[graft] def trendsIncrementalAt(
      s: SparkSession, d: String, frac: Double): DataFrame = {
    val e = Tables.events(s, d)
    val mid = e.agg(floor(max(col("event_id")) * frac).cast(LongType).as("mid"))
    val tagged = e.crossJoin(broadcast(mid))
      .select(to_date(col("ts")).as("day"), col("user_id"),
        (col("event_id") <= col("mid")).as("is_hist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val histPairs = tagged.filter(col("is_hist"))
      .select(col("day"), col("user_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newPairs = tagged.filter(!col("is_hist"))
      .select(col("day"), col("user_id")).distinct()
      .join(histPairs, Seq("day", "user_id"), "left_anti")
    val rows = tagged.groupBy(col("day")).agg(
      count(when(col("is_hist"), 1)).as("n_hist"),
      count(when(!col("is_hist"), 1)).as("n_delta"),
      countDistinct(col("user_id")).as("u_full")) // audit twin
    val uHist = histPairs.groupBy(col("day")).agg(count(lit(1)).as("u_hist"))
    val uNew = newPairs.groupBy(col("day")).agg(count(lit(1)).as("u_new"))
    rows.join(uHist, Seq("day"), "left").join(uNew, Seq("day"), "left")
      .select(col("day"), col("n_hist"), col("n_delta"),
        coalesce(col("u_hist"), lit(0L)).as("u_hist"),
        coalesce(col("u_new"), lit(0L)).as("u_new"),
        (coalesce(col("u_hist"), lit(0L)) +
          coalesce(col("u_new"), lit(0L))).as("u_merged"),
        (coalesce(col("u_hist"), lit(0L)) + coalesce(col("u_new"), lit(0L)) ===
          col("u_full")).as("consistent"))
  }

  val trendsIncrementalSql: String =
    """WITH mid AS (SELECT max(event_id) // 2 AS mid FROM events),
      |t AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id,
      |    event_id <= mid.mid AS is_hist
      |  FROM events CROSS JOIN mid),
      |hp AS (SELECT DISTINCT day, user_id FROM t WHERE is_hist),
      |np AS (
      |  SELECT DISTINCT day, user_id FROM t WHERE NOT is_hist
      |  EXCEPT SELECT day, user_id FROM hp),
      |rows_ AS (
      |  SELECT day,
      |    count(*) FILTER (WHERE is_hist)::BIGINT AS n_hist,
      |    count(*) FILTER (WHERE NOT is_hist)::BIGINT AS n_delta,
      |    count(DISTINCT user_id)::BIGINT AS u_full
      |  FROM t GROUP BY day),
      |uh AS (SELECT day, count(*)::BIGINT AS u_hist FROM hp GROUP BY day),
      |un AS (SELECT day, count(*)::BIGINT AS u_new FROM np GROUP BY day)
      |SELECT r.day, r.n_hist, r.n_delta,
      |  coalesce(uh.u_hist, 0)::BIGINT AS u_hist,
      |  coalesce(un.u_new, 0)::BIGINT AS u_new,
      |  (coalesce(uh.u_hist, 0) + coalesce(un.u_new, 0))::BIGINT AS u_merged,
      |  coalesce(uh.u_hist, 0) + coalesce(un.u_new, 0) = r.u_full AS consistent
      |FROM rows_ r LEFT JOIN uh USING (day) LEFT JOIN un USING (day)""".stripMargin

  /** Q-PROD-36: top JOURNEYS — PostHog's paths visualization ranks the
    * most common consecutive event SEQUENCES; this is the 3-step form:
    * every consecutive (e₁→e₂→e₃) triple per user (event-id order, the
    * table's time-monotone key), counted and top-[[JourneysTopK]]
    * elected with a full deterministic tie-break.
    *
    * Shape at 100 TB: one user-keyed window (the same partitioning
    * every paths query shares) emits the triples map-side; the rollup
    * is |event-types|³-bounded (a dimension), and the election is
    * `TakeOrderedAndProject` — k rows cross the network.
    */
  val JourneysTopK = 20

  def journeys(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(JourneysTopK)
  }

  val journeysSql: String =
    s"""WITH t AS (
       |  SELECT event_type AS e1,
       |    lead(event_type, 1) OVER w AS e2,
       |    lead(event_type, 2) OVER w AS e3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
       |SELECT e1, e2, e3, count(*)::BIGINT AS n
       |FROM t WHERE e3 IS NOT NULL
       |GROUP BY e1, e2, e3
       |ORDER BY n DESC, e1, e2, e3 LIMIT $JourneysTopK""".stripMargin

  /** Q-PROD-37: marketing ATTRIBUTION — first-touch / last-touch per
    * conversion: for each user's FIRST purchase, the channel (the
    * `props.k % 5` stand-in for utm_source) of the first and of the
    * last view BEFORE it, plus the touch count — the
    * first/last/linear-attribution readout every growth team runs on
    * the event lake.
    *
    * Shape at 100 TB: conversions and touches are both user-keyed
    * conditional aggregates over one compact projection — the funnel
    * family's one-partitioning-end-to-end shape; `min_by`/`max_by`
    * keep it a single pass (no window, no self-join).
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        (get_json_object(col("props"), "$.k").cast(LongType) % 5).as("channel"))
    val conv = base.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("conv_eid"))
    base.filter(col("event_type") === "view")
      .join(conv, Seq("user_id"))
      .filter(col("event_id") < col("conv_eid"))
      .groupBy(col("user_id"), col("conv_eid"))
      .agg(
        expr("min_by(channel, event_id)").as("first_touch"),
        expr("max_by(channel, event_id)").as("last_touch"),
        count(lit(1)).as("n_touches"))
  }

  val attributionSql: String =
    """WITH base AS (
      |  SELECT user_id, event_id, event_type,
      |    json_extract_string(props, '$.k')::BIGINT % 5 AS channel
      |  FROM events),
      |conv AS (
      |  SELECT user_id, min(event_id) AS conv_eid
      |  FROM base WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT b.user_id, c.conv_eid,
      |  min_by(b.channel, b.event_id) AS first_touch,
      |  max_by(b.channel, b.event_id) AS last_touch,
      |  count(*)::BIGINT AS n_touches
      |FROM base b JOIN conv c USING (user_id)
      |WHERE b.event_type = 'view' AND b.event_id < c.conv_eid
      |GROUP BY b.user_id, c.conv_eid""".stripMargin

  /** Q-PROD-38: BOUNCE RATE per day — single-event sessions over total
    * sessions, on the shared [[sessionized]] definition (the web
    * analytics readout PostHog surfaces per pageview/session). A
    * session's day is its first event's day (epoch-us floor — integer
    * arithmetic, identical in both engines).
    */
  def bounce(s: SparkSession, d: String): DataFrame = {
    val sess = sessionized(s, d)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"))
      .select(floor(col("start_us") / lit(86400000000L)).as("epoch_day"),
        col("n_events"))
    sess.groupBy(col("epoch_day"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("n_events") === 1, 1)).as("n_bounced"))
      .withColumn("bounce_rate",
        col("n_bounced").cast("double") / col("n_sessions"))
  }

  val bounceSql: String =
    s"""WITH $sessionizedCte,
       |per AS (
       |  SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       |    min(us) AS start_us
       |  FROM sess GROUP BY user_id, session_id),
       |d AS (SELECT start_us // 86400000000 AS epoch_day, n_events FROM per)
       |SELECT epoch_day,
       |  count(*)::BIGINT AS n_sessions,
       |  count(*) FILTER (WHERE n_events = 1)::BIGINT AS n_bounced,
       |  count(*) FILTER (WHERE n_events = 1)::DOUBLE / count(*) AS bounce_rate
       |FROM d GROUP BY epoch_day""".stripMargin

  /** Q-PROD-39: INCREMENTAL funnel maintenance (IVM) — the funnel twin
    * of [[trendsIncremental]]: never rescan history. The maintained
    * state is the per-user greedy-chain anchor triple
    * (view/click/purchase first-match event ids) over the history
    * half; the delta's events extend each user's chain with three
    * conditional mins. Because the delta arrives AFTER history
    * (event-id order = time; at scale, the ingestion-partition
    * boundary), a filled history stage is final and an unfilled one
    * can only be filled from the delta — `coalesce(hist, min(delta
    * WHERE after prior stage))` is exactly the full greedy chain
    * (late-arriving EARLIER events are the streaming funnel's
    * re-anchor case, spec-pinned in StreamingSpec, not this
    * maintenance path). In-row gate: the merged triple equals the
    * full-recompute twin.
    *
    * Shape at 100 TB: every stage keys on `user_id` — the funnel
    * family's one-partitioning-end-to-end shape; the state table is
    * users-sized, the delta scan is partition-pruned, and only the
    * audit twin (test-scale) reads history.
    */
  def funnelIncremental(s: SparkSession, d: String): DataFrame =
    funnelIncrementalAt(s, d, 0.5)

  /** [[funnelIncremental]] at an arbitrary history/delta split point
    * (fraction of the max event id). The in-row `consistent` gate must
    * hold at EVERY split — OperatorFuzzSpec sweeps the boundaries
    * (0 = everything is delta, 1 = everything is history).
    */
  private[graft] def funnelIncrementalAt(
      s: SparkSession, d: String, frac: Double): DataFrame = {
    val e = Tables.events(s, d)
    val mid = e.agg(floor(max(col("event_id")) * frac).cast(LongType).as("mid"))
    val base = e.crossJoin(broadcast(mid))
      .select(col("user_id"), col("event_type"), col("event_id"),
        (col("event_id") <= col("mid")).as("is_hist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def chain(src: DataFrame): DataFrame = {
      val s1 = src.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("event_id")).as("v"))
      val s2 = src.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("event_id") > col("v"))
        .groupBy(col("user_id")).agg(min(col("event_id")).as("c"))
      val s3 = src.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("event_id") > col("c"))
        .groupBy(col("user_id")).agg(min(col("event_id")).as("p"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
    }
    val hist = chain(base.filter(col("is_hist")))
      .select(col("user_id"), col("v").as("v_h"), col("c").as("c_h"), col("p").as("p_h"))
    val delta = base.filter(!col("is_hist"))
    // stage 1: anchor = history's, else the delta's first view
    val dv = delta.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("v_d"))
    val a1 = hist.join(dv, Seq("user_id"), "full")
      .select(col("user_id"), coalesce(col("v_h"), col("v_d")).as("view_eid"),
        col("c_h"), col("p_h"))
      .filter(col("view_eid").isNotNull)
    // stage 2: history's click, else the delta's first click after the anchor
    val dc = delta.filter(col("event_type") === "click")
      .join(a1.select(col("user_id"), col("view_eid")), Seq("user_id"))
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("c_d"))
    val a2 = a1.join(dc, Seq("user_id"), "left")
      .select(col("user_id"), col("view_eid"),
        coalesce(col("c_h"), col("c_d")).as("click_eid"), col("p_h"))
    // stage 3: history's purchase, else the delta's first after the click
    val dp = delta.filter(col("event_type") === "purchase")
      .join(a2.filter(col("click_eid").isNotNull)
        .select(col("user_id"), col("click_eid")), Seq("user_id"))
      .filter(col("event_id") > col("click_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("p_d"))
    val merged = a2.join(dp, Seq("user_id"), "left")
      .select(col("user_id"), col("view_eid"), col("click_eid"),
        coalesce(col("p_h"), col("p_d")).as("purchase_eid"))
    // audit twin: the full recompute (test-scale only at 100 TB)
    val full = chain(base)
      .select(col("user_id"), col("v").as("v_f"), col("c").as("c_f"), col("p").as("p_f"))
    merged.join(full, Seq("user_id"), "full")
      .select(col("user_id"), col("view_eid"), col("click_eid"), col("purchase_eid"),
        (lit(1) + when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("steps_reached"),
        (col("view_eid") <=> col("v_f") && col("click_eid") <=> col("c_f") &&
          col("purchase_eid") <=> col("p_f")).as("consistent"))
  }

  val funnelIncrementalSql: String =
    """WITH mid AS (SELECT max(event_id) // 2 AS mid FROM events),
      |b AS (
      |  SELECT user_id, event_type, event_id, event_id <= mid.mid AS is_hist
      |  FROM events CROSS JOIN mid),
      |h1 AS (SELECT user_id, min(event_id) AS v_h FROM b
      |       WHERE is_hist AND event_type = 'view' GROUP BY user_id),
      |h2 AS (SELECT b.user_id, min(b.event_id) AS c_h FROM b JOIN h1 USING (user_id)
      |       WHERE b.is_hist AND b.event_type = 'click' AND b.event_id > h1.v_h
      |       GROUP BY b.user_id),
      |h3 AS (SELECT b.user_id, min(b.event_id) AS p_h FROM b JOIN h2 USING (user_id)
      |       WHERE b.is_hist AND b.event_type = 'purchase' AND b.event_id > h2.c_h
      |       GROUP BY b.user_id),
      |hist AS (SELECT h1.user_id, h1.v_h, h2.c_h, h3.p_h
      |         FROM h1 LEFT JOIN h2 USING (user_id) LEFT JOIN h3 USING (user_id)),
      |dv AS (SELECT user_id, min(event_id) AS v_d FROM b
      |       WHERE NOT is_hist AND event_type = 'view' GROUP BY user_id),
      |a1 AS (SELECT coalesce(hist.user_id, dv.user_id) AS user_id,
      |         coalesce(hist.v_h, dv.v_d) AS view_eid, hist.c_h, hist.p_h
      |       FROM hist FULL JOIN dv ON hist.user_id = dv.user_id
      |       WHERE coalesce(hist.v_h, dv.v_d) IS NOT NULL),
      |dc AS (SELECT b.user_id, min(b.event_id) AS c_d
      |       FROM b JOIN a1 USING (user_id)
      |       WHERE NOT b.is_hist AND b.event_type = 'click' AND b.event_id > a1.view_eid
      |       GROUP BY b.user_id),
      |a2 AS (SELECT a1.user_id, a1.view_eid, coalesce(a1.c_h, dc.c_d) AS click_eid, a1.p_h
      |       FROM a1 LEFT JOIN dc USING (user_id)),
      |dp AS (SELECT b.user_id, min(b.event_id) AS p_d
      |       FROM b JOIN a2 USING (user_id)
      |       WHERE NOT b.is_hist AND b.event_type = 'purchase'
      |         AND a2.click_eid IS NOT NULL AND b.event_id > a2.click_eid
      |       GROUP BY b.user_id),
      |m AS (SELECT a2.user_id, a2.view_eid, a2.click_eid,
      |        coalesce(a2.p_h, dp.p_d) AS purchase_eid
      |      FROM a2 LEFT JOIN dp USING (user_id)),
      |f1 AS (SELECT user_id, min(event_id) AS v_f FROM b
      |       WHERE event_type = 'view' GROUP BY user_id),
      |f2 AS (SELECT b.user_id, min(b.event_id) AS c_f FROM b JOIN f1 USING (user_id)
      |       WHERE b.event_type = 'click' AND b.event_id > f1.v_f GROUP BY b.user_id),
      |f3 AS (SELECT b.user_id, min(b.event_id) AS p_f FROM b JOIN f2 USING (user_id)
      |       WHERE b.event_type = 'purchase' AND b.event_id > f2.c_f GROUP BY b.user_id),
      |full_ AS (SELECT f1.user_id, f1.v_f, f2.c_f, f3.p_f
      |          FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id))
      |SELECT coalesce(m.user_id, full_.user_id) AS user_id,
      |  m.view_eid, m.click_eid, m.purchase_eid,
      |  (1 + CASE WHEN m.click_eid IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN m.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached,
      |  (m.view_eid IS NOT DISTINCT FROM full_.v_f
      |   AND m.click_eid IS NOT DISTINCT FROM full_.c_f
      |   AND m.purchase_eid IS NOT DISTINCT FROM full_.p_f) AS consistent
      |FROM m FULL JOIN full_ ON m.user_id = full_.user_id""".stripMargin

  /** Q-PROD-40: trends with a NUMERIC breakdown — PostHog bins a
    * numeric property into 10 equal-width buckets between the observed
    * min and max; per day × bin: events, distinct users, exact-decimal
    * value sum. Two passes: a global (min, max) reduce (one broadcast
    * row), then the binned rollup. The bin arithmetic is the same
    * IEEE expression in both engines — subtract/multiply/divide are
    * correctly rounded, `floor` is exact, so the bin index is
    * bit-deterministic (and partition-count-invariant: min/max are
    * exact).
    */
  def trendsBinned(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"), col("user_id"), col("value"))
    val ext = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    e.crossJoin(broadcast(ext))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(9.0),
            floor((col("value") - col("lo")) * lit(10.0) / (col("hi") - col("lo"))))
            .cast(LongType)))
      .groupBy(col("day"), col("bin"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("u_users"),
        sumd(col("value")).as("sum_value"))
  }

  val trendsBinnedSql: String =
    """WITH e AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id, value
      |  FROM events WHERE event_type = 'purchase'),
      |ext AS (SELECT min(value) AS lo, max(value) AS hi FROM e)
      |SELECT day,
      |  CASE WHEN hi = lo THEN 0
      |       ELSE least(9.0, floor((value - lo) * 10.0 / (hi - lo)))::BIGINT
      |  END AS bin,
      |  count(*)::BIGINT AS n_events,
      |  count(DISTINCT user_id)::BIGINT AS u_users,
      |  sum(value::DECIMAL(14,2))::DOUBLE AS sum_value
      |FROM e CROSS JOIN ext
      |GROUP BY day, bin""".stripMargin

  /** Q-PROD-41: paths with CLEANING RULES — PostHog's path cleaning
    * applies regex aliasing rules to node names BEFORE edges form
    * (wildcarding `/product/123` → `/product/:id`), drops excluded
    * nodes, and collapses the consecutive repeats the aliasing
    * creates. Here: `view|click` alias to `browse`, `error` is
    * excluded, runs collapse to their first event, then edges count.
    *
    * Shape at 100 TB: the aliasing/exclusion is map-side; collapse and
    * edge-emission are two window passes over ONE user-keyed
    * partitioning; the rollup output is alias-vocabulary bounded.
    */
  def pathsCleaned(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val cleaned = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        regexp_replace(col("event_type"), "^(view|click)$", "browse").as("node"))
      .filter(col("node") =!= "error")
    val collapsed = cleaned
      .withColumn("prev", lag(col("node"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("node"))
    collapsed
      .withColumn("next", lead(col("node"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("node").as("src"), col("next").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  val pathsCleanedSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id,
      |    regexp_replace(event_type, '^(view|click)$', 'browse') AS node
      |  FROM events
      |  WHERE regexp_replace(event_type, '^(view|click)$', 'browse') <> 'error'),
      |k AS (
      |  SELECT user_id, event_id, node,
      |    lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      |  FROM c),
      |f AS (SELECT user_id, event_id, node FROM k
      |      WHERE prev IS NULL OR prev <> node),
      |e AS (
      |  SELECT node AS src,
      |    lead(node) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
      |  FROM f)
      |SELECT src, dst, count(*)::BIGINT AS n
      |FROM e WHERE dst IS NOT NULL GROUP BY src, dst""".stripMargin

  /** Q-PROD-42: funnel AGGREGATED BY GROUP — PostHog's "unique
    * companies/teams" funnel mode: the greedy 3-step chain evaluated
    * over each GROUP's pooled event stream (any member advances the
    * group), keyed on the team slot from the P10 group-attribution
    * pipe. The group dimension is tiny by construction, so every join
    * after the attribution hop broadcasts.
    */
  def funnelGroups(s: SparkSession, d: String): DataFrame = {
    // persist: three funnel stages read `base`; without the cache each
    // stage re-runs the whole wire-derived attribution pipe (measured
    // 6.3 s → the single-scan cost of its trends sibling)
    val base = Tables.events(s, d)
      .select(col("event_id"), col("event_type"))
      .join(graft.ingest.IngestQueries.groupAttribution(s, d)
        .select(col("event_id"), col("group1")), Seq("event_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val s1 = base.filter(col("event_type") === "view")
      .groupBy(col("group1")).agg(min(col("event_id")).as("view_eid"))
    val s2 = base.filter(col("event_type") === "click")
      .join(broadcast(s1), Seq("group1"))
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("group1")).agg(min(col("event_id")).as("click_eid"))
    val s3 = base.filter(col("event_type") === "purchase")
      .join(broadcast(s2), Seq("group1"))
      .filter(col("event_id") > col("click_eid"))
      .groupBy(col("group1")).agg(min(col("event_id")).as("purchase_eid"))
    s1.join(s2, Seq("group1"), "left")
      .join(s3, Seq("group1"), "left")
      .select(col("group1"), col("view_eid"), col("click_eid"), col("purchase_eid"),
        (lit(1) + when(col("click_eid").isNotNull, 1).otherwise(0) +
          when(col("purchase_eid").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("steps_reached"))
  }

  val funnelGroupsSql: String =
    s"""WITH ga AS (${graft.ingest.IngestQueries.groupAttributionSql}),
       |b AS (
       |  SELECT e.event_id, e.event_type, ga.group1
       |  FROM events e JOIN ga USING (event_id)),
       |s1 AS (SELECT group1, min(event_id) AS view_eid FROM b
       |       WHERE event_type = 'view' GROUP BY group1),
       |s2 AS (SELECT b.group1, min(b.event_id) AS click_eid
       |       FROM b JOIN s1 USING (group1)
       |       WHERE b.event_type = 'click' AND b.event_id > s1.view_eid
       |       GROUP BY b.group1),
       |s3 AS (SELECT b.group1, min(b.event_id) AS purchase_eid
       |       FROM b JOIN s2 USING (group1)
       |       WHERE b.event_type = 'purchase' AND b.event_id > s2.click_eid
       |       GROUP BY b.group1)
       |SELECT s1.group1, s1.view_eid, s2.click_eid, s3.purchase_eid,
       |  (1 + CASE WHEN s2.click_eid IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN s3.purchase_eid IS NOT NULL THEN 1 ELSE 0 END)::INT AS steps_reached
       |FROM s1 LEFT JOIN s2 USING (group1) LEFT JOIN s3 USING (group1)""".stripMargin

  /** Q-PROD-43: PATHS BETWEEN FUNNEL STEPS — PostHog's drill-down on a
    * leaky funnel: for every user who converted view→click, the event
    * paths they took strictly BETWEEN their two anchor events
    * (edges over the events with view_eid ≤ id ≤ click_eid, endpoints
    * included), counted across users. Answers "what did converters do
    * between seeing and clicking".
    *
    * Shape at 100 TB: the anchor table is the funnel chain's user-keyed
    * conditional mins; the between-slice is one user-keyed join +
    * filter; edge emission is a window over the SAME user partitioning
    * — the funnel family's one-shuffle discipline, edge rollup
    * |types|²-bounded.
    */
  def pathsFunnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"))
    val s1 = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("view_eid"))
    val s2 = base.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("event_id") > col("view_eid"))
      .groupBy(col("user_id")).agg(min(col("event_id")).as("click_eid"))
    val anchors = s1.join(s2, Seq("user_id"))
    val between = base.join(anchors, Seq("user_id"))
      .filter(col("event_id") >= col("view_eid") &&
        col("event_id") <= col("click_eid"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    between
      .withColumn("next", lead(col("event_type"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("event_type").as("src"), col("next").as("dst"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("u_users"))
  }

  val pathsFunnelSql: String =
    """WITH b AS (SELECT user_id, event_type, event_id FROM events),
      |s1 AS (SELECT user_id, min(event_id) AS view_eid FROM b
      |       WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT b.user_id, min(b.event_id) AS click_eid
      |       FROM b JOIN s1 USING (user_id)
      |       WHERE b.event_type = 'click' AND b.event_id > s1.view_eid
      |       GROUP BY b.user_id),
      |a AS (SELECT s1.user_id, s1.view_eid, s2.click_eid
      |      FROM s1 JOIN s2 USING (user_id)),
      |bet AS (
      |  SELECT b.user_id, b.event_type, b.event_id
      |  FROM b JOIN a USING (user_id)
      |  WHERE b.event_id >= a.view_eid AND b.event_id <= a.click_eid),
      |e AS (
      |  SELECT user_id, event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
      |  FROM bet)
      |SELECT src, dst, count(*)::BIGINT AS n,
      |  count(DISTINCT user_id)::BIGINT AS u_users
      |FROM e WHERE dst IS NOT NULL GROUP BY src, dst""".stripMargin

  /** Q-PROD-44: INCREMENTAL retention maintenance — the third IVM
    * instance (trends ✓ funnel ✓): never rescan history for the weekly
    * retention triangle. Maintained state: the first-seen
    * (user, week) pairs table and the user→cohort_week table. The
    * arrival delta contributes (a) brand-new (user, week) activity
    * pairs (anti-join against the state) and (b) cohorts for users
    * first seen in the delta (`coalesce(hist cohort, delta min)` — a
    * delta arriving after history can never move an existing cohort
    * earlier; late data is the streaming re-anchor case, not this
    * maintenance path). Per (cohort_week, week_offset): the merged
    * distinct-user count plus the in-row gate that it equals the full
    * recompute twin.
    *
    * Shape at 100 TB: the pairs table and every join key on user — one
    * hash partitioning end-to-end (bucket the state tables on user and
    * the exchanges disappear); the delta scan is partition-pruned; the
    * triangle rollup is dimension-sized.
    */
  def retentionIncremental(s: SparkSession, d: String): DataFrame =
    retentionIncrementalAt(s, d, 0.5)

  /** [[retentionIncremental]] at an arbitrary split fraction (see
    * [[funnelIncrementalAt]]).
    */
  private[graft] def retentionIncrementalAt(
      s: SparkSession, d: String, frac: Double): DataFrame = {
    val e = Tables.events(s, d)
    val mid = e.agg(floor(max(col("event_id")) * frac).cast(LongType).as("mid"))
    val tagged = e.crossJoin(broadcast(mid))
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"),
        (col("event_id") <= col("mid")).as("is_hist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val histPairs = tagged.filter(col("is_hist"))
      .select(col("user_id"), col("week")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val histCohort = histPairs.groupBy(col("user_id"))
      .agg(min(col("week")).as("c_h"))
    val deltaPairs = tagged.filter(!col("is_hist"))
      .select(col("user_id"), col("week")).distinct()
    val newPairs = deltaPairs.join(histPairs, Seq("user_id", "week"), "left_anti")
    val mergedPairs = histPairs.unionByName(newPairs)
    val cohort = histCohort
      .join(deltaPairs.groupBy(col("user_id")).agg(min(col("week")).as("c_d")),
        Seq("user_id"), "full")
      .select(col("user_id"), coalesce(col("c_h"), col("c_d")).as("cohort_week"))
    val merged = mergedPairs.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    // audit twin: the full recompute (test-scale only at 100 TB)
    val weeksAll = tagged.select(col("user_id"), col("week")).distinct()
    val full = weeksAll
      .join(weeksAll.groupBy(col("user_id")).agg(min(col("week")).as("cw")),
        Seq("user_id"))
      .groupBy(col("cw").as("cohort_week"),
        (col("week") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_full"))
    merged.join(full, Seq("cohort_week", "week_offset"), "full")
      .select(col("cohort_week"), col("week_offset"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        (col("n_users") <=> col("n_full")).as("consistent"))
  }

  val retentionIncrementalSql: String =
    s"""WITH mid AS (SELECT max(event_id) // 2 AS mid FROM events),
       |t AS (
       |  SELECT user_id, epoch_us(ts) // $WeekUs AS week,
       |    event_id <= mid.mid AS is_hist
       |  FROM events CROSS JOIN mid),
       |hp AS (SELECT DISTINCT user_id, week FROM t WHERE is_hist),
       |hc AS (SELECT user_id, min(week) AS c_h FROM hp GROUP BY user_id),
       |dp AS (SELECT DISTINCT user_id, week FROM t WHERE NOT is_hist),
       |np AS (SELECT user_id, week FROM dp
       |       EXCEPT SELECT user_id, week FROM hp),
       |mp AS (SELECT user_id, week FROM hp UNION ALL SELECT user_id, week FROM np),
       |dc AS (SELECT user_id, min(week) AS c_d FROM dp GROUP BY user_id),
       |co AS (SELECT coalesce(hc.user_id, dc.user_id) AS user_id,
       |         coalesce(hc.c_h, dc.c_d) AS cohort_week
       |       FROM hc FULL JOIN dc ON hc.user_id = dc.user_id),
       |m AS (
       |  SELECT co.cohort_week, mp.week - co.cohort_week AS week_offset,
       |    count(*)::BIGINT AS n_users
       |  FROM mp JOIN co USING (user_id)
       |  GROUP BY 1, 2),
       |wa AS (SELECT DISTINCT user_id, week FROM t),
       |f AS (
       |  SELECT fw.cw AS cohort_week, wa.week - fw.cw AS week_offset,
       |    count(*)::BIGINT AS n_full
       |  FROM wa JOIN (SELECT user_id, min(week) AS cw FROM wa GROUP BY user_id) fw
       |    USING (user_id)
       |  GROUP BY 1, 2)
       |SELECT coalesce(m.cohort_week, f.cohort_week) AS cohort_week,
       |  coalesce(m.week_offset, f.week_offset) AS week_offset,
       |  coalesce(m.n_users, 0)::BIGINT AS n_users,
       |  m.n_users IS NOT DISTINCT FROM f.n_full AS consistent
       |FROM m FULL JOIN f
       |  ON m.cohort_week = f.cohort_week AND m.week_offset = f.week_offset""".stripMargin

  /** Q-PROD-45: lifecycle BY PERSON PROPERTY — [[lifecycle]] split by
    * the replayed person-state `plan`, completing the state × product
    * composition quartet (funnel ✓ retention ✓ trends ✓): per
    * (plan, week, status) the new/returning/resurrecting/dormant user
    * counts. Same one-window shape as [[lifecycle]]; the person
    * dimension rides the user key.
    */
  def lifecycleCohort(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val persons = graft.state.StateQueries.personDim(s, d)
      .select(
        regexp_extract(col("canonical_id"), "([0-9]+)$", 1)
          .cast(LongType).as("user_id"),
        coalesce(col("plan"), lit("none")).as("plan"))
    val weeks = Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
      .distinct()
      .join(persons, Seq("user_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val lagged = weeks
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("next_week", lead(col("week"), 1).over(w))
    val maxWeek = weeks.agg(max(col("week")).as("max_week"))
    val active = lagged.select(
      col("plan"), col("week"),
      when(col("prev_week").isNull, "new")
        .when(col("week") - col("prev_week") === 1, "returning")
        .otherwise("resurrecting").as("status"))
    val dormant = lagged
      .crossJoin(broadcast(maxWeek))
      .filter(col("week") + 1 <= col("max_week") &&
        (col("next_week").isNull || col("next_week") > col("week") + 1))
      .select(col("plan"), (col("week") + 1).as("week"), lit("dormant").as("status"))
    active.union(dormant)
      .groupBy(col("plan"), col("week"), col("status"))
      .agg(count(lit(1)).as("n_users"))
  }

  val lifecycleCohortSql: String =
    s"""WITH p AS (${graft.state.StateQueries.pipePersonsSql}),
       |pu AS (
       |  SELECT regexp_extract(canonical_id, '([0-9]+)$$', 1)::BIGINT AS user_id,
       |    coalesce(plan, 'none') AS plan
       |  FROM p),
       |weeks AS (
       |  SELECT DISTINCT e.user_id, epoch_us(e.ts) // $WeekUs AS week, pu.plan
       |  FROM events e JOIN pu USING (user_id)),
       |lagged AS (
       |  SELECT user_id, plan, week,
       |    lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
       |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
       |  FROM weeks),
       |mx AS (SELECT max(week) AS max_week FROM weeks),
       |act AS (
       |  SELECT plan, week,
       |    CASE WHEN prev_week IS NULL THEN 'new'
       |         WHEN week - prev_week = 1 THEN 'returning'
       |         ELSE 'resurrecting' END AS status
       |  FROM lagged),
       |dor AS (
       |  SELECT l.plan, l.week + 1 AS week, 'dormant' AS status
       |  FROM lagged l, mx
       |  WHERE l.week + 1 <= mx.max_week
       |    AND (l.next_week IS NULL OR l.next_week > l.week + 1))
       |SELECT plan, week, status, count(*)::BIGINT AS n_users
       |FROM (SELECT * FROM act UNION ALL SELECT * FROM dor)
       |GROUP BY plan, week, status""".stripMargin

  /** Q-PROD-46: stickiness BY PERSON PROPERTY — the active-days
    * histogram split by the replayed person-state `plan` (the fifth
    * insight type in the state × product composition family). Shape is
    * [[stickiness]] with the user-dimension join riding the same user
    * key.
    */
  def stickinessCohort(s: SparkSession, d: String): DataFrame = {
    val persons = graft.state.StateQueries.personDim(s, d)
      .select(
        regexp_extract(col("canonical_id"), "([0-9]+)$", 1)
          .cast(LongType).as("user_id"),
        coalesce(col("plan"), lit("none")).as("plan"))
    Tables.events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"))
      .join(persons, Seq("user_id"))
      .groupBy(col("plan"), col("n_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  val stickinessCohortSql: String =
    s"""WITH p AS (${graft.state.StateQueries.pipePersonsSql}),
       |pu AS (
       |  SELECT regexp_extract(canonical_id, '([0-9]+)$$', 1)::BIGINT AS user_id,
       |    coalesce(plan, 'none') AS plan
       |  FROM p),
       |days AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day FROM events),
       |ud AS (SELECT user_id, count(*)::BIGINT AS n_days FROM days GROUP BY user_id)
       |SELECT pu.plan, ud.n_days, count(*)::BIGINT AS n_users
       |FROM ud JOIN pu USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- anomaly

  /** Q-PROD-ANOM: volume anomaly detection on the daily event series
    * (PostHog trends alerting / anomaly alerts): each day's total
    * event count is tested against its trailing window of the 7
    * previous OBSERVED days — flagged when |x − mean| > 3σ. The test
    * runs in EXACT integer arithmetic (no sqrt, no double
    * accumulation): with n trailing counts, S = Σc, Q = Σc², the 3σ
    * verdict is algebraically `(n·x − S)² > 9·(n·Q − S²)` — both sides
    * are integers, so the engines agree bit-for-bit. The
    * cross-multiplied squares run in DECIMAL(38,0) (DuckDB: HUGEINT):
    * at production volumes a daily count of 10¹⁰ puts (n·x − S)² at
    * ~10²² — past int64, far inside 38 digits.
    *
    * Shape at 100 TB: one partial+final count over the fact scan; the
    * rolling window runs over the per-DAY rollup — a calendar-bounded
    * dimension (≤ 366·years rows), whitelisted in
    * [[graft.plans.BoundedWindows]]. Emitted sums stay BIGINT (audit
    * columns); only the verdict needs the wide arithmetic.
    */
  def anomaly(s: SparkSession, d: String): DataFrame =
    anomalyVerdict(
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt")))

  /** The 3σ verdict over a (day, cnt) daily rollup — THE single
    * definition of the alerting rule, shared by the batch query and
    * the streaming twin (`q_stream_anomaly` applies it to the
    * watermark-finalized series) so the rule cannot drift.
    */
  def anomalyVerdict(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    val nX = col("win_n").cast(d38) * col("cnt") - col("win_sum")
    val nVar = col("win_n").cast(d38) * col("win_sum2") -
      col("win_sum").cast(d38) * col("win_sum")
    daily
      .withColumn("win_n", count(lit(1)).over(w))
      .withColumn("win_sum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("win_sum2",
        coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .select(col("day"), col("cnt"), col("win_n"), col("win_sum"), col("win_sum2"),
        (col("win_n") === 7 && nX * nX > lit(9).cast(d38) * nVar).as("anomaly"))
  }

  val anomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS cnt
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, cnt,
      |    count(*) OVER win AS win_n,
      |    coalesce(sum(cnt) OVER win, 0) AS win_sum,
      |    coalesce(sum(cnt * cnt) OVER win, 0) AS win_sum2
      |  FROM daily
      |  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT day, cnt, win_n::BIGINT AS win_n, win_sum::BIGINT AS win_sum,
      |  win_sum2::BIGINT AS win_sum2,
      |  (win_n = 7 AND
      |   (win_n::HUGEINT * cnt - win_sum) * (win_n::HUGEINT * cnt - win_sum)
      |     > 9::HUGEINT * (win_n::HUGEINT * win_sum2 - win_sum::HUGEINT * win_sum)) AS anomaly
      |FROM w""".stripMargin

  // -------------------------------------------------------------- forecast

  /** Q-PROD-FCST: trend forecasting baselines with an integer-exact
    * backtest (the projection line under PostHog's trends, and the
    * reference series the anomaly rule is judged against): per day,
    * (a) the seasonal-naive forecast — the count exactly 7 CALENDAR
    * days earlier (a self-join on the day dimension, NULL when that
    * day is absent), and (b) the smoothed form — the mean of the up
    * to 4 previous OBSERVED same-weekday counts. Errors are emitted
    * divisionless so everything stays int64-exact: `sn_abs_err =
    * |cnt − sn_forecast|` and `sw_err_x_n = |cnt·sw_n − sw_sum|`
    * (the mean error cross-multiplied by its denominator).
    *
    * Shape at 100 TB: one partial+final count over the fact scan;
    * the self-join and the weekday-partitioned window both run on the
    * calendar-bounded day rollup (≤366·years rows, 7-key partitions —
    * no single-partition window, no whitelist needed).
    */
  def forecast(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the V-row day rollup feeds BOTH the weekday window and
    // the d-7 self-join — without it the events scan runs twice (the
    // trends precedent; no exchange reuse for a reused intermediate)
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one materialized dow column + both window aggregates in ONE
    // select: per-withColumn `dayofweek(day)` aliases get distinct
    // attribute ids, defeating CollapseWindow (two Window ops, two
    // sorts, two exchanges for the same spec)
    val w = Window.partitionBy(col("dow")).orderBy(col("day"))
      .rowsBetween(-4, -1)
    val sn = daily.select(date_add(col("day"), 7).as("day"),
      col("cnt").as("sn_forecast"))
    daily
      .withColumn("dow", dayofweek(col("day")))
      .select(col("day"), col("cnt"),
        count(lit(1)).over(w).as("sw_n"),
        coalesce(sum(col("cnt")).over(w), lit(0L)).as("sw_sum"))
      .join(sn, Seq("day"), "left")
      .select(col("day"), col("cnt"), col("sn_forecast"),
        abs(col("cnt") - col("sn_forecast")).as("sn_abs_err"),
        col("sw_n"), col("sw_sum"),
        abs(col("cnt") * col("sw_n") - col("sw_sum")).as("sw_err_x_n"))
  }

  val forecastSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS cnt
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, cnt,
      |    count(*) OVER win AS sw_n,
      |    coalesce(sum(cnt) OVER win, 0) AS sw_sum
      |  FROM daily
      |  WINDOW win AS (PARTITION BY dayofweek(day) ORDER BY day
      |                 ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
      |SELECT w.day, w.cnt, f.cnt AS sn_forecast,
      |  abs(w.cnt - f.cnt) AS sn_abs_err,
      |  w.sw_n::BIGINT AS sw_n, w.sw_sum::BIGINT AS sw_sum,
      |  abs(w.cnt * w.sw_n - w.sw_sum)::BIGINT AS sw_err_x_n
      |FROM w LEFT JOIN daily f ON f.day + 7 = w.day""".stripMargin

  // ------------------------------------------------------------- entry/exit

  /** Q-PROD-EE: entry/exit analysis (the PostHog web-analytics
    * entry-page/exit-page rollup, expressed over event types): for
    * every gap-session (the shared [[sessionized]] definition), the
    * first and last event type — deterministic (us, event_id)
    * tie-break — then session counts per (day, entry, exit) cell,
    * where the day is the session's start day.
    *
    * Shape at 100 TB: the sessionization window and the per-session
    * min_by/max_by aggregate share ONE user-keyed partitioning (no
    * second shuffle); the final rollup shuffles only the
    * (day × entry × exit) dimension cells.
    */
  def entryExit(s: SparkSession, d: String): DataFrame = {
    val sess = sessionized(s, d)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        expr("min_by(event_type, (us, event_id))").as("entry_type"),
        expr("max_by(event_type, (us, event_id))").as("exit_type"),
        min(col("us")).as("start_us"))
    sess
      .groupBy(to_date(timestamp_micros(col("start_us"))).as("day"),
        col("entry_type"), col("exit_type"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  val entryExitSql: String =
    s"""WITH $sessionizedCte,
       |se AS (
       |  SELECT user_id, session_id, event_type, us,
       |    row_number() OVER (PARTITION BY user_id, session_id
       |                       ORDER BY us, event_id) AS rn,
       |    count(*) OVER (PARTITION BY user_id, session_id) AS cnt
       |  FROM sess),
       |ee AS (
       |  SELECT user_id, session_id,
       |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
       |    max(CASE WHEN rn = cnt THEN event_type END) AS exit_type,
       |    min(us) AS start_us
       |  FROM se GROUP BY user_id, session_id)
       |SELECT CAST(make_timestamp(start_us) AS DATE) AS day,
       |  entry_type, exit_type, count(*)::BIGINT AS n_sessions
       |FROM ee GROUP BY 1, 2, 3""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_prod_anomaly", anomaly, Some(anomalySql)),
    Q("q_prod_forecast", forecast, Some(forecastSql)),
    Q("q_prod_entry_exit", entryExit, Some(entryExitSql)),
    Q("q_prod_stickiness_cohort", stickinessCohort, Some(stickinessCohortSql)),
    Q("q_prod_lifecycle_cohort", lifecycleCohort, Some(lifecycleCohortSql)),
    Q("q_prod_retention_incremental", retentionIncremental, Some(retentionIncrementalSql)),
    Q("q_prod_paths_funnel", pathsFunnel, Some(pathsFunnelSql)),
    Q("q_prod_funnel_groups", funnelGroups, Some(funnelGroupsSql)),
    Q("q_prod_trends", trends, Some(trendsSql)),
    Q("q_prod_trends_breakdown", trendsBreakdown, Some(trendsBreakdownSql)),
    Q("q_prod_breakdown", breakdown, Some(breakdownSql)),
    Q("q_prod_funnel_daily", funnelDaily, Some(funnelDailySql)),
    Q("q_prod_funnel", funnel, Some(funnelSql)),
    Q("q_prod_funnel_time", funnelTime, Some(funnelTimeSql)),
    Q("q_prod_wau", wau, Some(wauSql)),
    Q("q_prod_retention", retention, Some(retentionSql)),
    Q("q_prod_range_join", rangeJoin, Some(rangeJoinSql)),
    Q("q_prod_lifecycle", lifecycle, Some(lifecycleSql)),
    Q("q_prod_paths", paths, Some(pathsSql)),
    Q("q_prod_stickiness", stickiness, Some(stickinessSql)),
    Q("q_prod_sessions", sessions, Some(sessionsSql)),
    Q("q_prod_correlation", correlation, Some(correlationSql)),
    Q("q_prod_session_funnel", sessionFunnel, Some(sessionFunnelSql)),
    Q("q_prod_funnel_strict", funnelStrict, Some(funnelStrictSql)),
    Q("q_prod_funnel_unordered", funnelUnordered, Some(funnelUnorderedSql)),
    Q("q_prod_first_time", firstTime, Some(firstTimeSql)),
    Q("q_prod_funnel_excl", funnelExcl, Some(funnelExclSql)),
    Q("q_prod_funnel_window", funnelWindow, Some(funnelWindowSql)),
    Q("q_prod_paths_anchored", pathsAnchored, Some(pathsAnchoredSql)),
    Q("q_prod_wau_sketch", wauSketch, Some(wauSketchSql)),
    Q("q_prod_retention_target", retentionTarget, Some(retentionTargetSql)),
    Q("q_prod_cohort_trends", cohortTrends, Some(cohortTrendsSql)),
    Q("q_prod_funnel_breakdown", funnelBreakdown, Some(funnelBreakdownSql)),
    Q("q_prod_trends_cumulative", trendsCumulative, Some(trendsCumulativeSql)),
    Q("q_prod_paths_markov", pathsMarkov, Some(pathsMarkovSql)),
    Q("q_prod_trends_compare", trendsCompare, Some(trendsCompareSql)),
    Q("q_prod_funnel_deep", funnelDeep, Some(funnelDeepSql)),
    Q("q_prod_funnel_cohort", funnelCohort, Some(funnelCohortSql)),
    Q("q_prod_retention_cohort", retentionCohort, Some(retentionCohortSql)),
    Q("q_prod_trends_cohort", trendsCohort, Some(trendsCohortSql)),
    Q("q_prod_trends_sampled", trendsSampled, Some(trendsSampledSql)),
    Q("q_prod_trends_groups", trendsGroups, Some(trendsGroupsSql)),
    Q("q_prod_trends_incremental", trendsIncremental, Some(trendsIncrementalSql)),
    Q("q_prod_journeys", journeys, Some(journeysSql)),
    Q("q_prod_attribution", attribution, Some(attributionSql)),
    Q("q_prod_bounce", bounce, Some(bounceSql)),
    Q("q_prod_funnel_incremental", funnelIncremental, Some(funnelIncrementalSql)),
    Q("q_prod_trends_binned", trendsBinned, Some(trendsBinnedSql)),
    Q("q_prod_paths_cleaned", pathsCleaned, Some(pathsCleanedSql)))
}
