package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
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

  val all: Seq[Q] = Seq(
    Q("q_prod_funnel", funnel, Some(funnelSql)),
    Q("q_prod_retention", retention, Some(retentionSql)),
    Q("q_prod_range_join", rangeJoin, Some(rangeJoinSql)))
}
