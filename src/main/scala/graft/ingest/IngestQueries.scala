package graft.ingest

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Normalizer.IngestContext

/** Oracle-checked drives of the ingest chain.
  *
  * Each query synthesizes wire payloads deterministically FROM the
  * `events` table, pushes them through the REAL ingest path (envelope
  * explode → classification → canonical projection, and for the wire
  * query an actual decompress round-trip), then emits scalar fields.
  * The DuckDB oracle computes the expected output directly from
  * `events` — an independent derivation, so any normalization bug
  * (precedence, routing, decode) hash-mismatches.
  *
  * **Bench hygiene**: payload synthesis (to_json, compress UDFs,
  * batch assembly) is NOT part of the measured operator — each query's
  * synthesized input is materialized once to a deterministic scratch
  * parquet ([[synth]]) and the query proper starts from that scan, so
  * BENCH numbers reflect decode+normalize only. [[prepare]] lets the
  * bench main pre-materialize outside its timers; correctness runs
  * simply pay the one-time write inline.
  */
object IngestQueries {

  /** Materialize-once scratch input (see [[Tables.scratch]]). */
  private def synth(s: SparkSession, d: String, name: String)(df: => DataFrame): DataFrame =
    Tables.scratch(s, d, name)(df)

  /** Pre-materialize every synthesized input (bench calls this before
    * starting timers).
    */
  def prepare(s: SparkSession, d: String): Unit =
    Seq(captureInput(s, d), wireInput(s, d), batchInput(s, d),
      enrichInput(s, d), hmacInput(s, d), groupsInput(s, d),
      formInput(s, d), browserInput(s, d), deadInput(s, d), sessionInput(s, d))
      .foreach(_.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ()))

  // ------------------------------------------------------------ Q-ING-1

  private def captureInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "capture") {
      val e = Tables.par(Tables.events(s, d))
      val body = to_json(struct(
        col("event_type").as("event"),
        concat(lit("u"), col("user_id")).as("distinct_id"),
        struct(get_json_object(col("props"), "$.k").cast(LongType).as("k")).as("properties"),
        when(col("event_id") % 2 === 0, concat(lit("key-"), col("user_id"))).as("api_key"),
        lit("sdk-scala").as("library")))
      e.select(col("ts"), body.as("body"))
    }

  /** Q-ING-1: capture normalization — api_key precedence
    * (item > header), unknown-key→extra routing, $sent_at header.
    */
  def capture(s: SparkSession, d: String): DataFrame = {
    val ctx = IngestContext(
      now = Normalizer.DetClock,
      headerApiKey = lit("hdr-key"),
      sentAtHeader = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
    Normalizer.ingest(captureInput(s, d), col("body"), ctx)
      .select(
        col("event"), col("distinct_id"), col("api_key"),
        get_json_object(col("properties"), "$.k").cast(LongType).as("prop_k"),
        element_at(col("extra"), "library").as("library"),
        element_at(col("extra"), "$sent_at").as("sent_at"))
  }

  val captureSql: String =
    """SELECT event_type AS event, 'u' || user_id AS distinct_id,
      |  CASE WHEN event_id % 2 = 0 THEN 'key-' || user_id ELSE 'hdr-key' END AS api_key,
      |  json_extract_string(props, '$.k')::BIGINT AS prop_k,
      |  'sdk-scala' AS library,
      |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS sent_at
      |FROM events""".stripMargin

  // ------------------------------------------------------------ Q-ING-2

  /** Wire bodies at rest: a third plain UTF-8 bytes, a third gzip bytes
    * (labeled), a third zlib bytes (UNlabeled → magic-byte sniffing).
    */
  private def wireInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "wire") {
      val e = Tables.par(Tables.events(s, d))
      val body = to_json(struct(
        col("event_type").as("event"),
        concat(lit("u"), col("user_id")).as("distinct_id")))
      val mode = (col("event_id") % 3).cast("int")
      e.select(
        col("event_id"), mode.as("mode"),
        when(mode === 0, body.cast("binary"))
          .when(mode === 1, Codecs.gzipUdf(body))
          .otherwise(Codecs.zlibUdf(body)).as("payload"),
        when(mode === 1, lit("gzip")).otherwise(lit(null).cast("string")).as("method"))
    }

  /** Q-ING-2: wire decode — the real decompress/sniff UDF over
    * at-rest payload bytes, then the full normalize chain.
    */
  def wire(s: SparkSession, d: String): DataFrame = {
    val in = wireInput(s, d)
      .withColumn("body", Codecs.decodeToString(col("payload"), col("method")))
    Normalizer.ingest(in.select(col("event_id"), col("mode"), col("body")),
        col("body"), Normalizer.detContext)
      .select(col("event_id"), col("mode"), col("event"), col("distinct_id"))
  }

  val wireSql: String =
    """SELECT event_id, (event_id % 3)::INT AS mode, event_type AS event,
      |  'u' || user_id AS distinct_id
      |FROM events""".stripMargin

  // ----------------------------------------------------------- Q-ING-7

  /** Browser-SDK bodies at rest: a third form+base64 plain, a third
    * form+base64+`compression=gzip-js` (a ZLIB stream — pako), a third
    * JSON `{data: <base64 zlib>}` with NO label (implicit-compression
    * sniff). Shared fields ride the form pairs / JSON envelope
    * (`extractors.rs:764-1091` test shapes).
    */
  private def formInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "form") {
      val e = Tables.par(Tables.events(s, d))
      val item = to_json(struct(
        col("event_type").as("event"),
        concat(lit("u"), col("user_id")).as("distinct_id")))
      val mode = (col("event_id") % 3).cast("int")
      val body = when(mode === 0, concat(
          lit("data="), url_encode(base64(item.cast("binary"))),
          lit("&api_key=fk-"), col("user_id") % 5))
        .when(mode === 1, concat(
          lit("data="), url_encode(base64(Codecs.zlibUdf(item))),
          lit("&compression=gzip-js")))
        .otherwise(to_json(struct(
          base64(Codecs.zlibUdf(item)).as("data"),
          concat(lit("jk-"), col("user_id") % 5).as("api_key"))))
      e.select(col("event_id"), mode.as("mode"), body.as("body"))
    }

  /** Q-ING-7 (S3): form-encoded / base64 / compressed `data` envelopes
    * through the full decode→normalize chain — urlencoded parse, base64,
    * labeled gzip-js (zlib), unlabeled sniff, shared-field inheritance
    * into items (`extractors.rs:457-505,593-631`).
    */
  def form(s: SparkSession, d: String): DataFrame =
    Normalizer.ingest(formInput(s, d), col("body"), Normalizer.detContext)
      .select(col("event_id"), col("mode"), col("event"), col("distinct_id"),
        col("api_key"))

  val formSql: String =
    """SELECT event_id, (event_id % 3)::INT AS mode, event_type AS event,
      |  'u' || user_id AS distinct_id,
      |  CASE (event_id % 3) WHEN 0 THEN 'fk-' || (user_id % 5)
      |       WHEN 2 THEN 'jk-' || (user_id % 5) END AS api_key
      |FROM events""".stripMargin

  // ----------------------------------------------------------- Q-ING-8

  private def browserInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "browser") {
      val e = Tables.par(Tables.events(s, d))
      val k = get_json_object(col("props"), "$.k").cast(LongType)
      val body = when(col("user_id") % 3 === 0, to_json(struct(
          lit("$identify").as("event"),
          struct(concat(lit("u"), col("user_id")).as("$distinct_id")).as("properties"),
          struct(concat(lit("p"), k % 3).as("plan")).as("$set"),
          struct(concat(lit("f"), col("user_id") % 7).as("first")).as("$set_once"),
          concat(lit("tok-"), col("user_id") % 5).as("token"),
          col("event_id").cast("string").as("eid"))))
        .when(col("user_id") % 3 === 1, to_json(struct(
          lit("$groupidentify").as("event"),
          concat(lit("u"), col("user_id")).as("distinct_id"),
          struct(
            lit("team").as("$group_type"),
            concat(lit("t"), col("user_id") % 7).as("$group_key"),
            struct(concat(lit("g"), k % 2).as("tier")).as("$group_set")).as("properties"),
          col("event_id").cast("string").as("eid"))))
        .otherwise(to_json(struct(
          lit("$groupidentify").as("event"),
          concat(lit("u"), col("user_id")).as("distinct_id"),
          struct(struct(concat(lit("g"), k % 2).as("tier")).as("$group_set")).as("properties"),
          col("event_id").cast("string").as("eid"))))
      e.select(body.as("body"))
    }

  /** Q-ING-8 (P6): browser `/e` sentinel rewrites — `$identify`
    * top-level `$set`→person_properties and `$set_once`→extra,
    * `properties.$distinct_id` resolution, token→api_key;
    * `$groupidentify` `properties.$group_type/$group_key/$group_set`
    * routing with the reference's `"unknown"` defaults
    * (lib.rs:500-581).
    */
  def browser(s: SparkSession, d: String): DataFrame =
    Normalizer.ingest(browserInput(s, d), col("body"), Normalizer.detContext)
      .select(
        element_at(col("extra"), "eid").cast(LongType).as("event_id"),
        col("event"), col("distinct_id"), col("api_key"),
        get_json_object(col("person_properties"), "$.plan").as("pp_plan"),
        get_json_object(element_at(col("extra"), "$set_once"), "$.first").as("so_first"),
        get_json_object(col("properties"), "$.tier").as("gp_tier"),
        element_at(col("extra"), "group_type").as("group_type"),
        element_at(col("extra"), "group_key").as("group_key"))

  val browserSql: String =
    """SELECT event_id,
      |  CASE user_id % 3 WHEN 0 THEN '$identify' ELSE '$groupidentify' END AS event,
      |  CASE user_id % 3 WHEN 0 THEN 'u' || user_id
      |       WHEN 1 THEN 't' || (user_id % 7) ELSE 'unknown' END AS distinct_id,
      |  CASE user_id % 3 WHEN 0 THEN 'tok-' || (user_id % 5) END AS api_key,
      |  CASE user_id % 3 WHEN 0 THEN 'p' || (json_extract_string(props, '$.k')::BIGINT % 3) END AS pp_plan,
      |  CASE user_id % 3 WHEN 0 THEN 'f' || (user_id % 7) END AS so_first,
      |  CASE user_id % 3 WHEN 0 THEN NULL
      |       ELSE 'g' || (json_extract_string(props, '$.k')::BIGINT % 2) END AS gp_tier,
      |  CASE user_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 'team' ELSE 'unknown' END AS group_type,
      |  CASE user_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 't' || (user_id % 7) ELSE 'unknown' END AS group_key
      |FROM events""".stripMargin

  // ------------------------------------------------------------ Q-ING-3

  private def batchInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "batch") {
      val e = Tables.par(Tables.events(s, d))
      val item = when(col("user_id") % 5 === 0, to_json(struct(
          lit("identify").as("type"),
          concat(lit("u"), col("user_id")).as("distinct_id"),
          struct(lit("pro").as("plan")).as("properties"))))
        .when(col("user_id") % 5 === 1, to_json(struct(
          concat(lit("u"), col("user_id")).as("distinct_id"),
          concat(lit("anon-"), col("user_id")).as("alias"))))
        .when(col("user_id") % 5 === 2, to_json(struct(
          lit("groupidentify").as("type"),
          lit("team").as("group_type"),
          concat(lit("team-"), col("user_id") % 7).as("group_key"))))
        .when(col("user_id") % 5 === 3, to_json(struct(
          concat(lit("u"), col("user_id")).as("distinct_id"),
          struct(lit("gold").as("tier")).as("$set"))))
        .otherwise(to_json(struct(
          col("event_type").as("event"),
          concat(lit("u"), col("user_id")).as("distinct_id"))))
      e.select((col("event_id") / 5).cast(LongType).as("batch_id"), col("event_id"), item.as("item"))
        .groupBy(col("batch_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("event_id"), col("item")))),
          x => x.getField("item")), ",").as("items"))
        .select(col("batch_id"), concat(
          lit("{\"api_key\":\"bk-"), col("batch_id"),
          lit("\",\"batch\":["), col("items"), lit("]}")).as("body"))
    }

  /** Q-ING-3: mixed-batch dispatch — batches of 5 items of rotating
    * kinds, envelope api_key inheritance, per-item classification
    * (lib.rs:1447-1592), group-identify distinct_id:=group_key.
    */
  def batch(s: SparkSession, d: String): DataFrame =
    Normalizer.ingest(batchInput(s, d), col("body"), Normalizer.detContext)
      .select(col("batch_id"), col("item_idx"), col("kind"), col("event"),
        col("distinct_id"), col("api_key"))

  val batchSql: String =
    """SELECT event_id // 5 AS batch_id,
      |  (row_number() OVER (PARTITION BY event_id // 5 ORDER BY event_id) - 1)::INT AS item_idx,
      |  CASE user_id % 5 WHEN 0 THEN 'identify' WHEN 1 THEN 'alias'
      |    WHEN 2 THEN 'group_identify' WHEN 3 THEN 'engage' ELSE 'capture' END AS kind,
      |  CASE user_id % 5 WHEN 0 THEN '$identify' WHEN 1 THEN '$create_alias'
      |    WHEN 2 THEN '$groupidentify' WHEN 3 THEN '$engage' ELSE event_type END AS event,
      |  CASE user_id % 5 WHEN 2 THEN 'team-' || (user_id % 7) ELSE 'u' || user_id END AS distinct_id,
      |  'bk-' || (event_id // 5) AS api_key
      |FROM events""".stripMargin

  // ------------------------------------------------------------ Q-ING-4

  private def enrichInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "enrich") {
      val e = Tables.par(Tables.events(s, d))
      val k = get_json_object(col("props"), "$.k").cast(LongType)
      val body = to_json(struct(
        lit("e").as("event"),
        col("event_id").cast("string").as("distinct_id"),
        when(k % 2 === 0, struct(lit("client-ip").as("$ip"), k.as("k")))
          .otherwise(struct(lit(null).cast("string").as("$ip"), k.as("k"))).as("properties")))
      e.select(col("user_id"), body.as("body"))
    }

  /** Q-ING-4: enrichment insert-if-absent — rows with even `k` already
    * carry a client `$ip` that must survive; odd rows get the request
    * ip (pipeline.rs:418-429 no-overwrite semantics). Also covers the
    * cf_* request fields (`extractors.rs:82-178`): cf_ray inserts,
    * a whitespace-only cf_colo header is dropped entirely
    * (header_value trim+non-empty filter).
    */
  def enrichQ(s: SparkSession, d: String): DataFrame = {
    val ctx = IngestContext(now = Normalizer.DetClock,
      requestIp = concat(lit("ip-"), col("user_id")),
      geo = Seq(
        "$geoip_country_code" -> lit("DE"),
        "cf_ray" -> concat(lit("ray-"), col("user_id") % 100),
        "cf_colo" -> lit("   ")),
      geoJson = Seq("cf_asn" -> (lit(13000) + col("user_id") % 7).cast("string")))
    Normalizer.enrich(
        Normalizer.ingest(enrichInput(s, d), col("body"), ctx), ctx)
      .select(
        col("distinct_id").cast(LongType).as("event_id"),
        get_json_object(col("properties"), "$.$ip").as("ip"),
        get_json_object(col("properties"), "$.$geoip_country_code").as("country"),
        get_json_object(col("properties"), "$.cf_ray").as("cf_ray"),
        get_json_object(col("properties"), "$.cf_asn").cast(LongType).as("cf_asn"),
        get_json_object(col("properties"), "$.cf_colo").as("cf_colo"))
  }

  val enrichSql: String =
    """SELECT event_id,
      |  CASE WHEN json_extract_string(props, '$.k')::BIGINT % 2 = 0
      |       THEN 'client-ip' ELSE 'ip-' || user_id END AS ip,
      |  'DE' AS country,
      |  'ray-' || (user_id % 100) AS cf_ray,
      |  13000 + user_id % 7 AS cf_asn,
      |  NULL::VARCHAR AS cf_colo
      |FROM events""".stripMargin

  // ------------------------------------------------------------ Q-ING-5

  private def hmacInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "hmac") {
      val e = Tables.par(Tables.events(s, d))
      val body = to_json(struct(lit("e").as("event"), col("event_id").cast("string").as("distinct_id")))
      val signedOver = when(col("event_id") % 7 === 0, concat(body, lit("tampered"))).otherwise(body)
      val sig = concat(lit("sha256="), Codecs.hmacSha256Udf(lit("top-secret"), signedOver.cast("binary")))
      e.select(col("event_id"), body.as("body"), sig.as("sig"))
    }

  /** Q-ING-5: HMAC signature gate — every 7th payload is signed over
    * tampered bytes and must be rejected (extractors.rs:320-399).
    */
  def hmac(s: SparkSession, d: String): DataFrame =
    hmacInput(s, d).select(col("event_id"),
      Codecs.verifySigUdf(lit("top-secret"), col("body").cast("binary"), col("sig")).as("valid"))

  val hmacSql: String =
    "SELECT event_id, event_id % 7 <> 0 AS valid FROM events"

  // ------------------------------------------------------------ Q-ING-6

  private def groupsInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "groups") {
      val e = Tables.par(Tables.events(s, d))
      val body = to_json(struct(
        lit("e").as("event"),
        col("event_id").cast("string").as("distinct_id"),
        struct(struct(
          concat(lit("c"), col("user_id") % 3).as("company"),
          concat(lit("t"), col("user_id") % 5).as("team")).as("$groups")).as("properties")))
      e.select(body.as("body"))
    }

  /** Q-ING-6: group slot mapping — `$groups` map pivoted into the five
    * configured positional columns (lib.rs:1378-1391).
    */
  def groups(s: SparkSession, d: String): DataFrame =
    Normalizer.ingest(groupsInput(s, d), col("body"), Normalizer.detContext)
      .select(col("distinct_id").cast(LongType).as("event_id"),
        col("group0"), col("group1"), col("group2"))

  val groupsSql: String =
    """SELECT event_id, 'c' || (user_id % 3) AS group0, 't' || (user_id % 5) AS group1,
      |  NULL::VARCHAR AS group2
      |FROM events""".stripMargin

  /** Per-event group attribution through the REAL slot-mapping pipe
    * ([[groups]]'s output keyed by event_id) — the read side product
    * analytics composes with for "aggregate by unique groups"
    * (PostHog group analytics). The closed form the oracle uses is
    * [[groupAttributionSql]]'s `ga` CTE (`'c' || (user_id % 3)`, the
    * same derivation [[groupsSql]] pins against the pipe).
    */
  def groupAttribution(s: SparkSession, d: String): DataFrame =
    groups(s, d).select(col("event_id"), col("group0"), col("group1"))

  val groupAttributionSql: String =
    """SELECT event_id, 'c' || (user_id % 3) AS group0, 't' || (user_id % 5) AS group1
      |FROM events""".stripMargin

  // ---------------------------------------------------------- Q-ING-10

  /** Session-recording chunks at rest: a third carry the
    * `/data/metadata/distinct_id` pointer AND a decoy top-level
    * `distinct_id` (pointer must win), a third only the top-level id,
    * a third neither (→ the literal `"session-recording"` fallback).
    * Mode-0 payloads also carry a `token` so api_key precedence
    * (header > payload token) is exercised both ways.
    */
  private def sessionInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "session") {
      val e = Tables.par(Tables.events(s, d))
      val mode = (col("event_id") % 3).cast("int")
      val body = when(mode === 0, to_json(struct(
          struct(
            struct(concat(lit("m"), col("user_id")).as("distinct_id")).as("metadata"),
            col("event_id").as("size")).as("data"),
          concat(lit("decoy"), col("user_id")).as("distinct_id"),
          concat(lit("stok-"), col("user_id") % 5).as("token"))))
        .when(mode === 1, to_json(struct(
          struct(col("event_id").as("size")).as("data"),
          concat(lit("top"), col("user_id")).as("distinct_id"))))
        .otherwise(to_json(struct(
          struct(col("event_id").as("size")).as("data"))))
      e.select(col("event_id"), col("user_id"), col("ts"), mode.as("mode"), body.as("body"))
    }

  /** Q-ING-10 (S9): session-recording intake (`/s`) — raw snapshot
    * chunk → `$snapshot` event with the whole payload in `properties`,
    * distinct_id via the pointer → top-level → literal fallback chain,
    * api_key via header → payload `token` (lib.rs:1149-1189,
    * pipeline.rs:338-365).
    */
  def session(s: SparkSession, d: String): DataFrame = {
    val ctx = IngestContext(
      now = Normalizer.DetClock,
      headerApiKey = when(col("event_id") % 2 === 0, concat(lit("hk-"), col("user_id"))),
      sentAtHeader = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
    Normalizer.sessionIntake(sessionInput(s, d), col("body"), ctx)
      .select(col("event_id"), col("mode"), col("event"), col("distinct_id"),
        col("api_key"),
        get_json_object(col("properties"), "$.data.size").cast(LongType).as("snap_size"),
        element_at(col("extra"), "$sent_at").as("sent_at"))
  }

  val sessionSql: String =
    """SELECT event_id, (event_id % 3)::INT AS mode, '$snapshot' AS event,
      |  CASE (event_id % 3) WHEN 0 THEN 'm' || user_id
      |       WHEN 1 THEN 'top' || user_id ELSE 'session-recording' END AS distinct_id,
      |  CASE WHEN event_id % 2 = 0 THEN 'hk-' || user_id
      |       WHEN event_id % 3 = 0 THEN 'stok-' || (user_id % 5) END AS api_key,
      |  event_id AS snap_size,
      |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS sent_at
      |FROM events""".stripMargin

  // ----------------------------------------------------------- Q-ING-9

  private def deadInput(s: SparkSession, d: String): DataFrame =
    synth(s, d, "dead") {
      val e = Tables.par(Tables.events(s, d))
      val mode = (col("event_id") % 4).cast("int")
      val body = when(mode === 0, to_json(struct(
          lit("ok").as("event"), concat(lit("u"), col("user_id")).as("distinct_id"))))
        .when(mode === 1, concat(lit("@@not-json-"), col("event_id")))
        .when(mode === 2, concat(lit("data=!!!bad~base64&compression=br&i="), col("event_id")))
        .otherwise(lit("   "))
      e.select(col("event_id"), body.as("body"))
    }

  /** Q-ING-9: the reject stream — undecodable/unparseable/empty bodies
    * surface with a reason instead of vanishing (the batch analogue of
    * the reference's 4xx rejects). A quarter of payloads are valid and
    * must NOT appear.
    */
  def dead(s: SparkSession, d: String): DataFrame =
    Normalizer.deadLetters(deadInput(s, d), col("body"))
      .select(col("event_id"), col("reason"))

  val deadSql: String =
    """SELECT event_id,
      |  CASE (event_id % 4) WHEN 1 THEN 'unparseable'
      |       WHEN 2 THEN 'undecodable' WHEN 3 THEN 'empty' END AS reason
      |FROM events WHERE event_id % 4 <> 0""".stripMargin

  // ---------------------------------------------------------- quota audit

  /** Q-INGEST-11: QUOTA enforcement audit — the reference's deployment
    * story includes per-org billing limits (PostHog quota limiting
    * drops events past the plan's allowance). Orgs are the
    * deterministic `user_id % 20` stand-in; the per-(org, day) volume
    * is compared against a RELATIVE quota — 2× the corpus-wide upper
    * median org-day volume (an exact integer order statistic, so the
    * audit is scale-free and bit-identical in both engines) — and the
    * per-org rollup reports days over quota and the events an
    * enforcing ingester would have dropped.
    *
    * Shape at 100 TB: one (org, day) rollup (map-side combined), a
    * 1-row broadcast quota, and an org-keyed re-aggregation of the
    * org-day dimension — the raw stream is touched once.
    */
  def quota(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDay = Tables.events(s, d)
      .select((col("user_id") % 20).as("org"), to_date(col("ts")).as("day"))
      .groupBy(col("org"), col("day")).agg(count(lit(1)).as("n"))
    // upper-median org-day volume: rank (cnt DIV 2 + 1) in (n, org, day)
    // order — integer-exact, deterministic total order
    val w = Window.orderBy(col("n"), col("org"), col("day"))
    val med = perDay
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over())
      .filter(col("rn") === expr("cnt DIV 2 + 1"))
      .select((col("n") * 2).as("quota"))
    perDay.crossJoin(broadcast(med))
      .groupBy(col("org"))
      .agg(count(lit(1)).as("days_active"),
        sum(col("n")).as("n_events"),
        count(when(col("n") > col("quota"), 1)).as("days_over"),
        coalesce(sum(when(col("n") > col("quota"), col("n") - col("quota"))), lit(0L))
          .cast(LongType).as("n_dropped"),
        first(col("quota")).as("quota"))
  }

  val quotaSql: String =
    """WITH pd AS (
      |  SELECT user_id % 20 AS org, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT n, row_number() OVER (ORDER BY n, org, day) AS rn,
      |    count(*) OVER () AS cnt
      |  FROM pd),
      |med AS (SELECT n * 2 AS quota FROM r WHERE rn = cnt // 2 + 1)
      |SELECT org, count(*)::BIGINT AS days_active, sum(n)::BIGINT AS n_events,
      |  count(*) FILTER (WHERE n > quota)::BIGINT AS days_over,
      |  coalesce(sum(CASE WHEN n > quota THEN n - quota END), 0)::BIGINT AS n_dropped,
      |  any_value(quota)::BIGINT AS quota
      |FROM pd CROSS JOIN med GROUP BY org""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_ingest_quota", quota, Some(quotaSql)),
    Q("q_ingest_capture", capture, Some(captureSql)),
    Q("q_ingest_wire", wire, Some(wireSql)),
    Q("q_ingest_batch", batch, Some(batchSql)),
    Q("q_ingest_enrich", enrichQ, Some(enrichSql)),
    Q("q_ingest_hmac", hmac, Some(hmacSql)),
    Q("q_ingest_groups", groups, Some(groupsSql)),
    Q("q_ingest_form", form, Some(formSql)),
    Q("q_ingest_browser", browser, Some(browserSql)),
    Q("q_ingest_dead", dead, Some(deadSql)),
    Q("q_ingest_session", session, Some(sessionSql)))
}
