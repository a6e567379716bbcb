package graft.queries

import graft.Tables
import graft.flags.{FlagColumns, FlagQueries}
import graft.flags.FlagColumns.FlagFrame
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Variant-at-rest TWINS of the props-heaviest registry queries
  * (VERDICT r14 #5). SURVEY §4 measured stored `VariantType` 1.2–1.8×
  * faster than string+`get_json_object` on props probes and recorded
  * it as the recommended production layout
  * ([[graft.sources.Lake.writeEventsVariant]]) — but no gated artifact
  * actually ran over stored Variant. These twins close that gap: each
  * scans ONE scratch table holding the JSON payload BOTH ways (the
  * original string and the ingest-time `try_parse_json` variant,
  * parquet-at-rest), computes the query through BOTH probe paths in
  * the same plan, and emits the string-path result (oracle-matched —
  * DuckDB cannot read Spark Variant parquet) plus an in-row
  * `variant_matches` gate (the [[Relational]] exact-twin pattern): the
  * hash breaks the moment the variant path diverges from the string
  * path on any row.
  *
  * At 100 TB the twin shape disappears — production writes ONE layout
  * (Variant, per the §4 decision) and queries probe it through
  * [[graft.sources.Lake.probeJson]], which compiles to `variant_get`
  * there and `get_json_object` on legacy string tables.
  */
object VariantQueries {

  /** events with props stored BOTH ways (string + variant) — parquet
    * scratch, built once outside the bench timers ([[prepare]]).
    */
  private def eventsPv(s: SparkSession, d: String): DataFrame =
    Tables.scratch(s, d, "events_pv") {
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        col("user_id"), col("props"),
        try_parse_json(col("props")).as("pv"))
    }

  /** replayed persons with the flag-relevant properties as BOTH a JSON
    * string and a variant (`to_json` drops null fields, mirroring the
    * original `map_filter`).
    */
  private def personsPv(s: SparkSession, d: String): DataFrame =
    Tables.scratch(s, d, "persons_pv") {
      graft.state.StateQueries.personDim(s, d)
        .select(col("canonical_id"),
          to_json(struct(col("plan"), col("last_event"), col("first_et"),
            col("first_plan"))).as("props_json"))
        .withColumn("pv", try_parse_json(col("props_json")))
    }

  /** Bench calls this outside the timers so twin timings measure the
    * probes, not the one-time scratch materialization.
    */
  def prepare(s: SparkSession, d: String): Unit = {
    eventsPv(s, d).count(); personsPv(s, d).count(); ()
  }

  /** Q-FN-JSON over stored Variant: the [[Relational.fnJson]] aggregate
    * computed from `get_json_object(props)` AND `variant_get(pv)` in
    * one scan; string-path columns are the oracle surface.
    */
  def fnJsonVariant(s: SparkSession, d: String): DataFrame = {
    val ks = get_json_object(col("props"), "$.k").cast(LongType)
    val kv = variant_get(col("pv"), "$.k", "long")
    eventsPv(s, d)
      .select(col("event_type"), ks.as("ks"), kv.as("kv"))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("ks") > 50, 1)).as("n"),
        coalesce(sum(when(col("ks") > 50, col("ks"))), lit(0L)).as("sum_k"),
        count(when(col("kv") > 50, 1)).as("n_v"),
        coalesce(sum(when(col("kv") > 50, col("kv"))), lit(0L)).as("sum_v"))
      .filter(col("n") > 0 || col("n_v") > 0)
      .select(col("event_type"), col("n"), col("sum_k"),
        (col("sum_k").cast(DoubleType) / col("n")).as("avg_k"),
        (col("n") === col("n_v") && col("sum_k") === col("sum_v"))
          .as("variant_matches"))
  }

  val fnJsonVariantSql: String =
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(sum(k) AS DOUBLE) / count(*) AS avg_k, TRUE AS variant_matches
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |WHERE k > 50 GROUP BY event_type""".stripMargin

  /** Q-SCAN-DRIFT over stored Variant: the all-keys payload-drift audit
    * ([[Relational.scanDrift]]) with the kv explosion done TWICE in one
    * scan — `from_json` map explode (string path, oracle surface) and
    * the `variant_explode` TVF over the stored variant — and the full
    * per-key aggregate compared across paths in-row. Exercises the
    * schemaless side of Variant (key enumeration), not just point
    * probes.
    */
  def scanDriftVariant(s: SparkSession, d: String): DataFrame = {
    val pv = eventsPv(s, d)
    pv.createOrReplaceTempView("graft_events_pv")
    // variant path: LATERAL variant_explode enumerates keys; the value
    // is a VARIANT — '$' string extraction matches the string path's
    // Map<String,String> rendering for string and integer payloads
    val vkv = s.sql(
      """SELECT event_id, ve.key AS key,
        |  variant_get(ve.value, '$', 'string') AS v
        |FROM graft_events_pv, LATERAL variant_explode(pv) ve""".stripMargin)
    val skv = pv.select(col("event_id"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))).as(Seq("key", "v")))
    val mid = pv.agg(floor(max(col("event_id")) / 2).cast(LongType).as("mid"))
    def drift(kv: DataFrame): DataFrame =
      kv.crossJoin(broadcast(mid))
        .select((col("event_id") <= col("mid")).as("is_a"), col("key"), col("v"),
          round(expr("try_cast(v AS double)") * 1e6).cast(LongType).as("qx"))
        .groupBy(col("key"))
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
              abs(col("qsum_b").cast(DecimalType(38, 0)) * col("n_a") -
                col("qsum_a").cast(DecimalType(38, 0)) * col("n_b")) >
                lit(Relational.ScanDriftTauMicro).cast(DecimalType(38, 0)) *
                  col("n_a") * col("n_b"),
              lit("mean_shift"))
            .otherwise(lit("stable")).as("verdict"))
    val sd = drift(skv)
    val vd = drift(vkv)
    val vCols = vd.columns.map(c => col(c).as(s"v_$c"))
    val matches = sd.columns.filter(_ != "key")
      .map(c => col(c) <=> col(s"v_$c")).reduce(_ && _)
    sd.join(vd.select(vCols.toSeq: _*), col("key") === col("v_key"), "full_outer")
      .select(sd.columns.map(col) :+
        (col("key").isNotNull && col("v_key").isNotNull && matches)
          .as("variant_matches"): _*)
  }

  /** Splice `insert` into composed oracle SQL at the UNIQUE `marker` —
    * guarded, because these twins extend another query's committed SQL
    * by text: if a later edit to the embedded base SQL introduced a
    * second occurrence of the marker, a silent first-match splice would
    * corrupt the oracle (r15 advisor). Literal (non-regex) matching.
    */
  private def spliceOnce(base: String, marker: String, replacement: String): String = {
    val first = base.indexOf(marker)
    require(first >= 0, s"oracle splice marker '$marker' not found")
    require(base.indexOf(marker, first + 1) < 0,
      s"oracle splice marker '$marker' occurs more than once — splice point ambiguous")
    base.substring(0, first) + replacement + base.substring(first + marker.length)
  }

  val scanDriftVariantSql: String =
    // same aggregate, one extra constant column — the in-row gate must
    // read TRUE everywhere for the hash to match
    spliceOnce(Relational.scanDriftSql,
      "AS verdict", "AS verdict, TRUE AS variant_matches")

  /** Q-FLAG-COHORT over stored Variant: the flag backfill evaluated
    * over person properties rebuilt from `get_json_object` (string
    * path, oracle surface) AND from `variant_get` point probes, every
    * flag verdict compared in-row.
    */
  def flagCohortVariant(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    val keys = Seq("plan", "last_event", "first_et", "first_plan")
    def propsOf(probe: String => Column): Column =
      map_filter(
        map(keys.flatMap(k => Seq(lit(k), probe(k))): _*), (_, v) => v.isNotNull)
    val withMaps = personsPv(s, d)
      .withColumn("props_s", propsOf(k => get_json_object(col("props_json"), s"$$.$k")))
      .withColumn("props_v", propsOf(k => variant_get(col("pv"), s"$$.$k", "string")))
    val fs = FlagFrame(col("canonical_id"), col("props_s"))
    val fv = FlagFrame(col("canonical_id"), col("props_v"))
    val flags = FlagQueries.cohortConfig
    val matches = flags.map(f =>
      FlagColumns.enabledCol(fs, f) <=> FlagColumns.enabledCol(fv, f)).reduce(_ && _)
    withMaps.select(col("canonical_id") +:
      flags.map(f => FlagColumns.enabledCol(fs, f).as(f.key)) :+
      matches.as("variant_matches"): _*)
  }

  val flagCohortVariantSql: String =
    spliceOnce(FlagQueries.flagCohortSql,
      "FROM p", ", TRUE AS variant_matches\nFROM p")

  val all: Seq[Q] = Seq(
    Q("q_fn_json_variant", fnJsonVariant, Some(fnJsonVariantSql)),
    Q("q_scan_drift_variant", scanDriftVariant, Some(scanDriftVariantSql)),
    Q("q_flag_cohort_variant", flagCohortVariant, Some(flagCohortVariantSql)))
}
