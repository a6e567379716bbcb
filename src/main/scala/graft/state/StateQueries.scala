package graft.state

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Oracle-checked drives of the stateful replay engine (SURVEY §2.B
  * Q-PIPE-1/2): synthesize a person/group op log from `events` that a
  * PostHog SDK would emit (anonymous browsing → signup → identified,
  * with an alias merge at signup), run the REAL generic replay
  * (CC identity fixpoint + ordered fold), and compare against a DuckDB
  * oracle that computes the final state in closed form.
  *
  * Op derivation (deterministic; k = props.k):
  *   - raw id: `anon-u<uid>` before the user's first signup, `u<uid>`
  *     from the signup on. Signup carries the alias edge
  *     anon-u<uid> → u<uid> (identify's $anon_distinct_id merge).
  *   - purchase: $set {plan: p<k%3>} + $set_once {first_plan: p<k%3>}
  *   - error: $unset [plan, first_plan]
  *   - every event: $set_once {first_et: <event_type>}
  *   - every non-error event: $set {last_event: <event_type>}
  *
  * Closed-form expectations the oracle computes independently:
  * plan = value of the last purchase after the last error (else null);
  * first_plan = value of the FIRST purchase after the last error
  * ($set_once refires after $unset); first_et = first event's type;
  * last_event = last non-error event's type; version follows the DO
  * merge semantics (the signup merge absorbs the anonymous record's
  * update count: merged.version = primary.version + 1, persons.rs:106)
  * so signed users count 1 + ops at/after signup, others all ops;
  * distinct_ids = {uX, anon-uX} iff the user ever signed up.
  */
object StateQueries {

  /** Identified ids out-rank anonymous ids for canonical election. */
  private val prio: Column => Column =
    id => concat(when(id.startsWith("anon-"), lit("1")).otherwise(lit("0")), lit("|"), id)

  def personOps(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val firstSignup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_signup"))
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val planVal = concat(lit("p"), k % 3)
    e.join(firstSignup, Seq("user_id"), "left")
      .select(
        when(col("first_signup").isNull || col("event_id") < col("first_signup"),
          concat(lit("anon-u"), col("user_id")))
          .otherwise(concat(lit("u"), col("user_id"))).as("raw_id"),
        col("event_id").as("ord"),
        map_filter(map_concat(
          when(col("event_type") === "purchase", map(lit("plan"), planVal))
            .otherwise(map().cast("map<string,string>")),
          when(col("event_type") =!= "error", map(lit("last_event"), col("event_type")))
            .otherwise(map().cast("map<string,string>"))),
          (_, v) => v.isNotNull).as("set"),
        map_filter(map_concat(
          map(lit("first_et"), col("event_type")),
          when(col("event_type") === "purchase", map(lit("first_plan"), planVal))
            .otherwise(map().cast("map<string,string>"))),
          (_, v) => v.isNotNull).as("set_once"),
        when(col("event_type") === "error", typedLit(Seq("plan", "first_plan")))
          .otherwise(typedLit(Seq.empty[String])).as("unset"),
        when(col("event_id") === col("first_signup"),
          concat(lit("anon-u"), col("user_id"))).as("alias_to"))
  }

  /** Q-PIPE-1: full person replay — identity fixpoint + ordered fold +
    * dense sequence ids, projected to scalar columns for the oracle.
    */
  def pipePersons(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ops = personOps(s, d).as[PersonOp]
    Replay.persons(s, ops, prio).toDF()
      .select(
        col("canonical_id"), col("person_seq_id"), col("version"),
        size(col("distinct_ids")).as("n_distinct_ids"),
        col("first_ord"),
        element_at(col("properties"), "plan").as("plan"),
        element_at(col("properties"), "last_event").as("last_event"),
        element_at(col("properties_set_once"), "first_et").as("first_et"),
        element_at(col("properties_set_once"), "first_plan").as("first_plan"))
  }

  val pipePersonsSql: String =
    """WITH sg AS (
      |  SELECT user_id, min(event_id) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT e.*, s.first_signup,
      |    json_extract_string(e.props, '$.k')::BIGINT AS k
      |  FROM events e LEFT JOIN sg s USING (user_id)),
      |err AS (
      |  SELECT user_id, coalesce(max(event_id) FILTER (WHERE event_type = 'error'), -1) AS last_err
      |  FROM base GROUP BY user_id),
      |agg AS (
      |  SELECT b.user_id,
      |    CASE WHEN b.first_signup IS NOT NULL THEN 'u' || b.user_id
      |         ELSE 'anon-u' || b.user_id END AS canonical_id,
      |    CASE WHEN b.first_signup IS NULL THEN count(*)
      |         ELSE 1 + count(*) FILTER (WHERE b.event_id >= b.first_signup) END AS version,
      |    CASE WHEN b.first_signup IS NOT NULL THEN 2 ELSE 1 END AS n_distinct_ids,
      |    min(b.event_id) AS first_ord,
      |    arg_max('p' || (b.k % 3), b.event_id)
      |      FILTER (WHERE b.event_type = 'purchase' AND b.event_id > er.last_err) AS plan,
      |    arg_max(b.event_type, b.event_id) FILTER (WHERE b.event_type <> 'error') AS last_event,
      |    arg_min(b.event_type, b.event_id) AS first_et,
      |    arg_min('p' || (b.k % 3), b.event_id)
      |      FILTER (WHERE b.event_type = 'purchase' AND b.event_id > er.last_err) AS first_plan
      |  FROM base b JOIN err er USING (user_id)
      |  GROUP BY b.user_id, b.first_signup)
      |SELECT canonical_id,
      |  (row_number() OVER (ORDER BY first_ord, canonical_id)) AS person_seq_id,
      |  version, n_distinct_ids, first_ord, plan, last_event, first_et, first_plan
      |FROM agg""".stripMargin

  /** Q-PIPE-8: SCD2 person history — the full property timeline of
    * every surviving person ([[Replay.personHistory]]'s trace fold),
    * one row per op that touched the primary-chain record with
    * `[valid_from, valid_to)` stamped by a lead window (last row
    * open-ended). A merged-away anonymous record's pre-signup rows die
    * at the merge, so a signed-up user's history STARTS at the signup
    * op — whose snapshot already carries the absorbed anonymous state
    * (merge-prefers-primary over an empty just-created primary ≡ the
    * anonymous record's state).
    *
    * The oracle derives each prefix state in closed form: `plan` /
    * `first_plan` reset at every `$unset` (error), so they read within
    * the CURRENT error-epoch (running error count partitions the
    * user's timeline); `last_event` / `first_et` are prefix arg_max /
    * arg_min. That a per-op state-machine trace equals four window
    * aggregates is exactly the SCD2 contract under test.
    */
  def pipeHistory(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ops = personOps(s, d).as[PersonOp]
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_id")).orderBy(col("valid_from"))
    Replay.personHistory(s, ops, prio).toDF()
      .select(
        col("canonical_id"), col("valid_from"),
        lead(col("valid_from"), 1).over(w).as("valid_to"),
        element_at(col("properties"), "plan").as("plan"),
        element_at(col("properties"), "last_event").as("last_event"),
        element_at(col("properties"), "first_et").as("first_et"),
        element_at(col("properties"), "first_plan").as("first_plan"),
        size(col("properties")).cast(LongType).as("n_props"))
  }

  /** Q-PIPE-9: point-in-time state read — for every history op, the
    * person's state STRICTLY BEFORE it ("what did we know entering
    * this event"), i.e. a temporal join of a probe stream against the
    * SCD2 timeline. Implemented the single-pass way (the same
    * discipline as the as-of joins): union the CHANGE rows and the
    * PROBE rows, order by (ord, probe-before-change), and take the
    * running `last(ignoreNulls)` of the packed state struct — one
    * user-keyed shuffle, no range join, state legitimately-null fields
    * survive because the WHOLE struct is the non-null marker.
    */
  def pipeAsofState(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = pipeHistory(s, d)
      .select(col("canonical_id"), col("valid_from").as("ord"),
        col("plan"), col("last_event"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val changes = hist.select(col("canonical_id"), col("ord"), lit(1).as("tag"),
      struct(col("plan"), col("last_event")).as("st"))
    val probes = hist.select(col("canonical_id"), col("ord"), lit(0).as("tag"),
      lit(null).cast("struct<plan:string,last_event:string>").as("st"))
    val w = Window.partitionBy(col("canonical_id")).orderBy(col("ord"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    changes.unionByName(probes)
      .withColumn("before", last(col("st"), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("canonical_id"), col("ord"),
        col("before").getField("plan").as("plan_before"),
        col("before").getField("last_event").as("last_event_before"))
  }

  val pipeAsofStateSql: String =
    """WITH sg AS (
      |  SELECT user_id, min(event_id) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT e.user_id, e.event_id, e.event_type,
      |    json_extract_string(e.props, '$.k')::BIGINT AS k, s.first_signup
      |  FROM events e LEFT JOIN sg s USING (user_id)),
      |pre AS (
      |  SELECT user_id, event_id, event_type, k, first_signup,
      |    count(*) FILTER (WHERE event_type = 'error')
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS errg,
      |    arg_max(event_type, event_id) FILTER (WHERE event_type <> 'error')
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS last_event
      |  FROM base),
      |ep AS (
      |  SELECT *,
      |    arg_max('p' || (k % 3), event_id) FILTER (WHERE event_type = 'purchase')
      |      OVER (PARTITION BY user_id, errg ORDER BY event_id) AS plan
      |  FROM pre),
      |surv AS (
      |  SELECT * FROM ep
      |  WHERE first_signup IS NULL OR event_id >= first_signup)
      |SELECT
      |  CASE WHEN first_signup IS NOT NULL THEN 'u' || user_id
      |       ELSE 'anon-u' || user_id END AS canonical_id,
      |  event_id AS ord,
      |  lag(plan) OVER (PARTITION BY user_id ORDER BY event_id) AS plan_before,
      |  lag(last_event) OVER (PARTITION BY user_id ORDER BY event_id) AS last_event_before
      |FROM surv""".stripMargin

  val pipeHistorySql: String =
    """WITH sg AS (
      |  SELECT user_id, min(event_id) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT e.user_id, e.event_id, e.event_type,
      |    json_extract_string(e.props, '$.k')::BIGINT AS k, s.first_signup
      |  FROM events e LEFT JOIN sg s USING (user_id)),
      |pre AS (
      |  SELECT user_id, event_id, event_type, k, first_signup,
      |    count(*) FILTER (WHERE event_type = 'error')
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS errg,
      |    arg_max(event_type, event_id) FILTER (WHERE event_type <> 'error')
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS last_event,
      |    arg_min(event_type, event_id)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS first_et
      |  FROM base),
      |ep AS (
      |  SELECT *,
      |    arg_max('p' || (k % 3), event_id) FILTER (WHERE event_type = 'purchase')
      |      OVER (PARTITION BY user_id, errg ORDER BY event_id) AS plan,
      |    arg_min('p' || (k % 3), event_id) FILTER (WHERE event_type = 'purchase')
      |      OVER (PARTITION BY user_id, errg ORDER BY event_id) AS first_plan
      |  FROM pre),
      |surv AS (
      |  SELECT * FROM ep
      |  WHERE first_signup IS NULL OR event_id >= first_signup)
      |SELECT
      |  CASE WHEN first_signup IS NOT NULL THEN 'u' || user_id
      |       ELSE 'anon-u' || user_id END AS canonical_id,
      |  event_id AS valid_from,
      |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
      |  plan, last_event, first_et, first_plan,
      |  ((plan IS NOT NULL)::BIGINT + (last_event IS NOT NULL)::BIGINT +
      |   (first_et IS NOT NULL)::BIGINT + (first_plan IS NOT NULL)::BIGINT) AS n_props
      |FROM surv""".stripMargin

  def groupOps(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.select(
      lit("segment").as("group_type"),
      concat(lit("seg-"), col("user_id") % 10).as("group_key"),
      col("event_id").as("ord"),
      map(lit("last_et"), col("event_type"),
        lit("last_k"), get_json_object(col("props"), "$.k")).as("set"))
  }

  /** Q-PIPE-2: group replay — last-write-wins upsert per
    * (group_type, group_key), version = op count, first-touch ord.
    */
  def pipeGroups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ops = groupOps(s, d).as[GroupOp]
    Replay.groups(s, ops).toDF()
      .select(col("group_type"), col("group_key"), col("version"), col("first_ord"),
        element_at(col("properties"), "last_et").as("last_et"),
        element_at(col("properties"), "last_k").cast(LongType).as("last_k"))
  }

  val pipeGroupsSql: String =
    """SELECT 'segment' AS group_type, 'seg-' || (user_id % 10) AS group_key,
      |  count(*) AS version, min(event_id) AS first_ord,
      |  arg_max(event_type, event_id) AS last_et,
      |  arg_max(json_extract_string(props, '$.k')::BIGINT, event_id) AS last_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Q-PIPE-3: person-snapshot attachment (P9) — every event left-joins
    * the replayed person dimension on the resolved canonical id (the
    * enrichment join that stamps person_id/person_properties onto
    * events; broadcast at serving scale).
    */
  def pipeSnapshot(s: SparkSession, d: String): DataFrame = {
    val persons = personDim(s, d)
      .select(col("canonical_id"), col("person_seq_id"), col("plan"))
    val e = Tables.events(s, d)
    val firstSignup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_signup"))
    e.join(firstSignup, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        when(col("first_signup").isNull, concat(lit("anon-u"), col("user_id")))
          .otherwise(concat(lit("u"), col("user_id"))).as("canonical_id"))
      .join(broadcast(persons), Seq("canonical_id"), "left")
      .select(col("event_id"), col("canonical_id"),
        col("person_seq_id").as("person_id"), col("plan").as("person_plan"))
  }

  val pipeSnapshotSql: String =
    s"""WITH p AS ($pipePersonsSql),
       |sg AS (SELECT user_id, min(event_id) AS first_signup
       |       FROM events WHERE event_type = 'signup' GROUP BY 1)
       |SELECT e.event_id,
       |  CASE WHEN s.first_signup IS NULL THEN 'anon-u' || e.user_id
       |       ELSE 'u' || e.user_id END AS canonical_id,
       |  p.person_seq_id AS person_id, p.plan AS person_plan
       |FROM events e
       |LEFT JOIN sg s USING (user_id)
       |LEFT JOIN p ON p.canonical_id = (CASE WHEN s.first_signup IS NULL
       |  THEN 'anon-u' || e.user_id ELSE 'u' || e.user_id END)""".stripMargin

  /** Q-PIPE-4: group property hydration (P11) — each event's `$groups`
    * entry looked up against the replayed group dimension and stamped
    * back onto the event (`hydrate_group_properties`, lib.rs:1393-1411).
    * The group dimension broadcasts; the fact side never shuffles.
    */
  def pipeHydrate(s: SparkSession, d: String): DataFrame = {
    val groups = pipeGroups(s, d)
      .select(col("group_key"), col("last_et"), col("last_k"), col("version"))
    Tables.events(s, d)
      .select(col("event_id"),
        concat(lit("seg-"), col("user_id") % 10).as("group_key"))
      .join(broadcast(groups), Seq("group_key"), "left")
      .select(col("event_id"), col("group_key"),
        col("last_et").as("group_last_et"),
        col("last_k").as("group_last_k"),
        col("version").as("group_version"))
  }

  val pipeHydrateSql: String =
    s"""WITH g AS ($pipeGroupsSql)
       |SELECT e.event_id, 'seg-' || (e.user_id % 10) AS group_key,
       |  g.last_et AS group_last_et, g.last_k AS group_last_k,
       |  g.version AS group_version
       |FROM events e LEFT JOIN g ON g.group_key = 'seg-' || (e.user_id % 10)""".stripMargin

  /** Wire-format bodies for the end-to-end pipeline drive: one PostHog
    * payload per event —
    *   - the user's FIRST signup → a server identify with bare props
    *     (email) + `$anon_distinct_id` (the implicit alias merge),
    *   - purchase → capture with `properties.$set{plan}` +
    *     `$set_once{first_plan}`,
    *   - error → engage `$unset` rotating through the reference's three
    *     accepted forms by k%3: string array / object-keys / bare string
    *     (the bare-string form unsets only `plan`),
    *   - everything else (view/click/late signups) → capture with
    *     `$set{last_event}` + `$set_once{first_et}`.
    * `eid` rides as an unknown key → `extra` (the replay's total order).
    */
  private[graft] def wireBodies(s: SparkSession, d: String): DataFrame = {
    val e = graft.Tables.par(Tables.events(s, d))
    val firstSignup = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("first_signup"))
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val anonId = concat(lit("anon-u"), col("user_id"))
    val uId = concat(lit("u"), col("user_id"))
    val id = when(col("first_signup").isNull || col("event_id") < col("first_signup"), anonId)
      .otherwise(uId)
    val eid = col("event_id").cast("string")
    val planVal = concat(lit("p"), k % 3)
    val et = col("event_type")
    val body =
      when(et === "signup" && col("event_id") === col("first_signup"), to_json(struct(
        lit("identify").as("type"), uId.as("distinct_id"), anonId.as("$anon_distinct_id"),
        struct(concat(uId, lit("@x.com")).as("email")).as("properties"), eid.as("eid"))))
      .when(et === "purchase", to_json(struct(
        lit("purchase").as("event"), id.as("distinct_id"),
        struct(struct(planVal.as("plan")).as("$set"),
          struct(planVal.as("first_plan")).as("$set_once")).as("properties"),
        eid.as("eid"))))
      .when(et === "error" && k % 3 === 0, to_json(struct(
        id.as("distinct_id"), array(lit("plan"), lit("first_plan")).as("$unset"), eid.as("eid"))))
      .when(et === "error" && k % 3 === 1, to_json(struct(
        id.as("distinct_id"), struct(lit(1).as("plan"), lit(1).as("first_plan")).as("$unset"),
        eid.as("eid"))))
      .when(et === "error", to_json(struct(
        id.as("distinct_id"), lit("plan").as("$unset"), eid.as("eid"))))
      .otherwise(to_json(struct(
        et.as("event"), id.as("distinct_id"),
        struct(struct(et.as("last_event")).as("$set"),
          struct(et.as("first_et")).as("$set_once")).as("properties"),
        eid.as("eid"))))
    graft.Tables.scratch(s, d, "pipe_wire") {
      e.join(firstSignup, Seq("user_id"), "left").select(body.as("body"))
    }
  }

  /** Pre-materialize the synthesized wire bodies (bench calls this
    * outside its timers — q_pipe_wire then measures the pipeline, not
    * the generator).
    */
  def prepare(s: SparkSession, d: String): Unit = {
    wireBodies(s, d).foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    groupWireBodies(s, d).foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    personDim(s, d).count(); ()
  }

  /** The replayed person dimension MATERIALIZED (parquet scratch) — the
    * serving-table form every insight query reads in production: at
    * 100 TB nobody re-runs identity resolution inside each trends/
    * funnel/flag query; the pipeline maintains the person table
    * (batch [[pipePersons]] rebuild, streaming
    * [[graft.sources.Snapshots.mergeEpoch]] upsert) and insights join
    * it user-keyed. The REPLAY itself stays a measured operator —
    * `q_pipe_persons`/`q_pipe_wire`/`q_pipe_stream_merge` rebuild it
    * from ops every run — while the cohort-consumer queries measure
    * THEIR operator over the dimension (sf1 had each of them paying a
    * redundant ~10-20 s replay, round 15). Content is byte-identical
    * to [[pipePersons]] (deterministic replay), so every consumer's
    * oracle is unchanged.
    *
    * CACHE INVALIDATION (r15 advisor): `Tables.scratch` is a
    * materialize-once-per-machine cache designed for deterministic
    * synthesized INPUTS; this is the one site caching ENGINE OUTPUT, so
    * the key must change whenever the replay could. The key carries
    * [[PersonDimVersion]] — BUMP IT with any semantic or schema change
    * to Replay/PersonOpExtract/IdentityResolver or the replay's output
    * projection. Without this, 8+ consumer queries would silently
    * verify against a stale dimension until /tmp/graft_synth is cleared
    * by hand. (A schema-hash key was tried first and reverted: merely
    * CONSTRUCTING the replay frame to read its schema runs jobs —
    * `RDD.zipWithIndex` inside [[Replay.persons]] computes partition
    * counts eagerly — so every WARM consumer paid a full ~2 s replay
    * per call, measured at sf0.1 across all 8 cohort insights. The
    * version literal keeps the warm path a pure parquet scan; the
    * `pipePersons` argument is by-name and never builds when warm.)
    */
  private val PersonDimVersion = 1

  def personDim(s: SparkSession, d: String): DataFrame =
    graft.Tables.scratch(s, d, s"person_dim_v$PersonDimVersion")(pipePersons(s, d))

  /** Q-PIPE-5 (T1 end-to-end): wire payloads → REAL ingest
    * (explode/classify/canonical) → REAL PersonOp extraction
    * ([[PersonOpExtract.fromCanonical]]) → identity CC + DO-exact fold
    * ([[Replay.persons]]) — the reference's whole person pipeline as
    * one composed dataflow, against a closed-form oracle.
    */
  def pipeWire(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val canonical = graft.ingest.Normalizer.ingest(
      wireBodies(s, d), col("body"), graft.ingest.Normalizer.detContext)
    val ops = PersonOpExtract
      .fromCanonical(canonical, element_at(col("extra"), "eid").cast(LongType))
      .as[PersonOp]
    Replay.persons(s, ops).toDF()
      .select(
        col("canonical_id"), col("person_seq_id"), col("version"),
        size(col("distinct_ids")).as("n_distinct_ids"),
        col("first_ord"),
        element_at(col("properties"), "email").as("email"),
        element_at(col("properties"), "plan").as("plan"),
        element_at(col("properties"), "last_event").as("last_event"),
        element_at(col("properties_set_once"), "first_plan").as("first_plan"),
        element_at(col("properties_set_once"), "first_et").as("first_et"))
  }

  val pipeWireSql: String =
    """WITH sg AS (
      |  SELECT user_id, min(event_id) AS first_signup
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |base AS (
      |  SELECT e.*, s.first_signup,
      |    json_extract_string(e.props, '$.k')::BIGINT AS k
      |  FROM events e LEFT JOIN sg s USING (user_id)),
      |err AS (
      |  SELECT user_id,
      |    coalesce(max(event_id) FILTER (WHERE event_type = 'error'), -1) AS last_err_plan,
      |    coalesce(max(event_id) FILTER (WHERE event_type = 'error' AND k % 3 IN (0, 1)), -1) AS last_err_fp
      |  FROM base GROUP BY user_id),
      |agg AS (
      |  SELECT b.user_id,
      |    CASE WHEN b.first_signup IS NOT NULL THEN 'u' || b.user_id
      |         ELSE 'anon-u' || b.user_id END AS canonical_id,
      |    CASE WHEN b.first_signup IS NULL THEN count(*)
      |         ELSE 1 + count(*) FILTER (WHERE b.event_id >= b.first_signup) END AS version,
      |    CASE WHEN b.first_signup IS NOT NULL THEN 2 ELSE 1 END AS n_distinct_ids,
      |    min(b.event_id) AS first_ord,
      |    CASE WHEN b.first_signup IS NOT NULL THEN 'u' || b.user_id || '@x.com' END AS email,
      |    arg_max('p' || (b.k % 3), b.event_id)
      |      FILTER (WHERE b.event_type = 'purchase' AND b.event_id > er.last_err_plan) AS plan,
      |    arg_min('p' || (b.k % 3), b.event_id)
      |      FILTER (WHERE b.event_type = 'purchase' AND b.event_id > er.last_err_fp) AS first_plan,
      |    arg_max(b.event_type, b.event_id)
      |      FILTER (WHERE b.event_type IN ('view', 'click')
      |              OR (b.event_type = 'signup' AND b.event_id <> b.first_signup)) AS last_event,
      |    arg_min(b.event_type, b.event_id)
      |      FILTER (WHERE b.event_type IN ('view', 'click')
      |              OR (b.event_type = 'signup' AND b.event_id <> b.first_signup)) AS first_et
      |  FROM base b JOIN err er USING (user_id)
      |  GROUP BY b.user_id, b.first_signup)
      |SELECT canonical_id,
      |  (row_number() OVER (ORDER BY first_ord, canonical_id)) AS person_seq_id,
      |  version, n_distinct_ids, first_ord, email, plan, last_event, first_plan, first_et
      |FROM agg""".stripMargin

  /** Q-PIPE-7 (streaming identity merge, driver-checked): the SAME
    * wire pipeline as [[pipeWire]], but replayed INCREMENTALLY through
    * [[graft.streaming.IdentityMerge]] in 3 ord-ascending micro-batch
    * chunks — aliases land in later chunks than the records they merge,
    * so every batch exercises the cross-batch resolve → connect →
    * re-key → seeded-merge path. Oracle: identical closed form as
    * q_pipe_wire (incremental == batch is the operator's contract).
    *
    * Cache lifetime: the returned DataFrame reads the state handle's
    * persisted RDD lazily, so `st.close()` cannot run here — the
    * caller must reclaim the blocks after consuming the result
    * ([[graft.Tables.releaseCaches]], which Bench/Verify invoke
    * between queries; ad-hoc callers should do the same).
    */
  def pipeStreamMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val canonical = graft.ingest.Normalizer.ingest(
      wireBodies(s, d), col("body"), graft.ingest.Normalizer.detContext)
    val ops = PersonOpExtract
      .fromCanonical(canonical, element_at(col("extra"), "eid").cast(LongType))
      .as[PersonOp]
    val st = graft.streaming.IdentityMerge.replayChunked(s, ops, 3)
    st.persons().toDF()
      .select(
        col("canonical_id"), col("person_seq_id"), col("version"),
        size(col("distinct_ids")).as("n_distinct_ids"),
        col("first_ord"),
        element_at(col("properties"), "email").as("email"),
        element_at(col("properties"), "plan").as("plan"),
        element_at(col("properties"), "last_event").as("last_event"),
        element_at(col("properties_set_once"), "first_plan").as("first_plan"),
        element_at(col("properties_set_once"), "first_et").as("first_et"))
  }

  /** Wire bodies exercising every group-update route: capture
    * `$groups`+`$group_set`, engage top-level `$groups`+`$group_set`,
    * `groupidentify` items, a `$group_set` entry with NO matching
    * `$groups` key (must be dropped), and `$groups`-only events (slots,
    * no update).
    */
  private def groupWireBodies(s: SparkSession, d: String): DataFrame = {
    val e = graft.Tables.par(Tables.events(s, d))
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val uid = col("user_id")
    val did = concat(lit("u"), uid)
    val eid = col("event_id").cast("string")
    val et = col("event_type")
    val teamKey = concat(lit("t"), uid % 7)
    val body =
      when(et === "click", to_json(struct(
        lit("pv").as("event"), did.as("distinct_id"),
        struct(struct(teamKey.as("team")).as("$groups"),
          struct(struct(k.as("last_click_k")).as("team")).as("$group_set")).as("properties"),
        eid.as("eid"))))
      .when(et === "error", to_json(struct(
        did.as("distinct_id"),
        struct(teamKey.as("team")).as("$groups"),
        struct(struct(k.as("last_err_k")).as("team")).as("$group_set"),
        eid.as("eid"))))
      .when(et === "signup", to_json(struct(
        lit("groupidentify").as("type"),
        lit("org").as("group_type"),
        concat(lit("o"), uid % 5).as("group_key"),
        struct(did.as("owner"), k.as("last_n")).as("properties"),
        eid.as("eid"))))
      .when(et === "purchase", to_json(struct(
        lit("buy").as("event"), did.as("distinct_id"),
        // $group_set for a type absent from $groups → dropped by the guard
        struct(struct(teamKey.as("team")).as("$groups"),
          struct(struct(k.as("x")).as("org")).as("$group_set")).as("properties"),
        eid.as("eid"))))
      .otherwise(to_json(struct( // view: slots only, no update
        lit("pv").as("event"), did.as("distinct_id"),
        struct(struct(teamKey.as("team")).as("$groups")).as("properties"),
        eid.as("eid"))))
    graft.Tables.scratch(s, d, "pipe_groups_wire") { e.select(body.as("body")) }
  }

  /** Q-PIPE-6 (T8 end-to-end): wire payloads → ingest →
    * [[GroupOpExtract.fromCanonical]] → group replay — the group-state
    * pipeline composed from real parts, against a closed-form oracle.
    */
  def pipeGroupsWire(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // persist the minimal canonical projection: the extraction reads it
    // twice (groupidentify branch + $group_set branch)
    val canonical = graft.ingest.Normalizer.ingest(
        groupWireBodies(s, d), col("body"), graft.ingest.Normalizer.detContext)
      .select(col("event"), col("properties"), col("extra"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ops = GroupOpExtract
      .fromCanonical(canonical, element_at(col("extra"), "eid").cast(LongType))
      .as[GroupOp]
    Replay.groups(s, ops).toDF()
      .select(col("group_type"), col("group_key"), col("version"), col("first_ord"),
        element_at(col("properties"), "last_click_k").cast(LongType).as("last_click_k"),
        element_at(col("properties"), "last_err_k").cast(LongType).as("last_err_k"),
        element_at(col("properties"), "owner").as("owner"),
        element_at(col("properties"), "last_n").cast(LongType).as("last_n"))
  }

  val pipeGroupsWireSql: String =
    """WITH base AS (
      |  SELECT event_id, user_id, event_type,
      |    json_extract_string(props, '$.k')::BIGINT AS k
      |  FROM events),
      |team AS (
      |  SELECT 'team' AS group_type, 't' || (user_id % 7) AS group_key,
      |    count(*) AS version, min(event_id) AS first_ord,
      |    arg_max(k, event_id) FILTER (WHERE event_type = 'click') AS last_click_k,
      |    arg_max(k, event_id) FILTER (WHERE event_type = 'error') AS last_err_k,
      |    NULL::VARCHAR AS owner, NULL::BIGINT AS last_n
      |  FROM base WHERE event_type IN ('click', 'error') GROUP BY user_id % 7),
      |org AS (
      |  SELECT 'org' AS group_type, 'o' || (user_id % 5) AS group_key,
      |    count(*) AS version, min(event_id) AS first_ord,
      |    NULL::BIGINT AS last_click_k, NULL::BIGINT AS last_err_k,
      |    arg_max('u' || user_id, event_id) AS owner,
      |    arg_max(k, event_id) AS last_n
      |  FROM base WHERE event_type = 'signup' GROUP BY user_id % 5)
      |SELECT * FROM team UNION ALL SELECT * FROM org""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_pipe_persons", pipePersons, Some(pipePersonsSql)),
    Q("q_pipe_history", pipeHistory, Some(pipeHistorySql)),
    Q("q_pipe_asof_state", pipeAsofState, Some(pipeAsofStateSql)),
    Q("q_pipe_groups", pipeGroups, Some(pipeGroupsSql)),
    Q("q_pipe_snapshot", pipeSnapshot, Some(pipeSnapshotSql)),
    Q("q_pipe_hydrate", pipeHydrate, Some(pipeHydrateSql)),
    Q("q_pipe_wire", pipeWire, Some(pipeWireSql)),
    Q("q_pipe_stream_merge", pipeStreamMerge, Some(pipeWireSql)),
    Q("q_pipe_groups_wire", pipeGroupsWire, Some(pipeGroupsWireSql)))
}
