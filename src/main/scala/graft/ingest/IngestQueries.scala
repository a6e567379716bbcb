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
  * query an actual gzip/zlib compress→decode round-trip), then emits
  * scalar fields. The DuckDB oracle computes the expected output
  * directly from `events` — an independent derivation, so any
  * normalization bug (precedence, routing, decode) hash-mismatches.
  */
object IngestQueries {

  /** Q-ING-1: capture normalization — api_key precedence
    * (item > header), unknown-key→extra routing, $sent_at header.
    */
  def capture(s: SparkSession, d: String): DataFrame = {
    val e = Tables.par(Tables.events(s, d))
    val body = to_json(struct(
      col("event_type").as("event"),
      concat(lit("u"), col("user_id")).as("distinct_id"),
      struct(get_json_object(col("props"), "$.k").cast(LongType).as("k")).as("properties"),
      when(col("event_id") % 2 === 0, concat(lit("key-"), col("user_id"))).as("api_key"),
      lit("sdk-scala").as("library")))
    val ctx = IngestContext(
      headerApiKey = lit("hdr-key"),
      sentAtHeader = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
    Normalizer.ingest(e.select(col("ts"), body.as("body")), col("body"), ctx)
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

  /** Q-ING-2: wire decode — a third of payloads plain, a third
    * gzip-labeled, a third zlib-UNlabeled (magic-byte sniffing), all
    * through the real compress→decode UDF round-trip.
    */
  def wire(s: SparkSession, d: String): DataFrame = {
    val e = Tables.par(Tables.events(s, d))
    val body = to_json(struct(
      col("event_type").as("event"),
      concat(lit("u"), col("user_id")).as("distinct_id")))
    val mode = (col("event_id") % 3).cast("int")
    val decoded = when(mode === 0, body)
      .when(mode === 1, Codecs.decodeToString(Codecs.gzipUdf(body), lit("gzip")))
      .otherwise(Codecs.decodeToString(Codecs.zlibUdf(body), lit(null).cast("string")))
    Normalizer.ingest(
        e.select(col("event_id"), mode.as("mode"), decoded.as("body")),
        col("body"), IngestContext())
      .select(col("event_id"), col("mode"), col("event"), col("distinct_id"))
  }

  val wireSql: String =
    """SELECT event_id, (event_id % 3)::INT AS mode, event_type AS event,
      |  'u' || user_id AS distinct_id
      |FROM events""".stripMargin

  /** Q-ING-3: mixed-batch dispatch — batches of 5 items of rotating
    * kinds, envelope api_key inheritance, per-item classification
    * (lib.rs:1447-1592), group-identify distinct_id:=group_key.
    */
  def batch(s: SparkSession, d: String): DataFrame = {
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
    val bodies = e
      .select((col("event_id") / 5).cast(LongType).as("batch_id"), col("event_id"), item.as("item"))
      .groupBy(col("batch_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("event_id"), col("item")))),
        x => x.getField("item")), ",").as("items"))
      .select(col("batch_id"), concat(
        lit("{\"api_key\":\"bk-"), col("batch_id"),
        lit("\",\"batch\":["), col("items"), lit("]}")).as("body"))
    Normalizer.ingest(bodies, col("body"), IngestContext())
      .select(col("batch_id"), col("item_idx"), col("kind"), col("event"),
        col("distinct_id"), col("api_key"))
  }

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

  /** Q-ING-4: enrichment insert-if-absent — rows with even `k` already
    * carry a client `$ip` that must survive; odd rows get the request
    * ip (pipeline.rs:418-429 no-overwrite semantics).
    */
  def enrichQ(s: SparkSession, d: String): DataFrame = {
    val e = Tables.par(Tables.events(s, d))
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val body = to_json(struct(
      lit("e").as("event"),
      col("event_id").cast("string").as("distinct_id"),
      when(k % 2 === 0, struct(lit("client-ip").as("$ip"), k.as("k")))
        .otherwise(struct(lit(null).cast("string").as("$ip"), k.as("k"))).as("properties")))
    val ctx = IngestContext(requestIp = concat(lit("ip-"), col("user_id")),
      geo = Seq("$geoip_country_code" -> lit("DE")))
    Normalizer.enrich(
        Normalizer.ingest(e.select(col("user_id"), body.as("body")), col("body"), ctx), ctx)
      .select(
        col("distinct_id").cast(LongType).as("event_id"),
        get_json_object(col("properties"), "$.$ip").as("ip"),
        get_json_object(col("properties"), "$.$geoip_country_code").as("country"))
  }

  val enrichSql: String =
    """SELECT event_id,
      |  CASE WHEN json_extract_string(props, '$.k')::BIGINT % 2 = 0
      |       THEN 'client-ip' ELSE 'ip-' || user_id END AS ip,
      |  'DE' AS country
      |FROM events""".stripMargin

  /** Q-ING-5: HMAC signature gate — every 7th payload is signed over
    * tampered bytes and must be rejected (extractors.rs:320-399).
    */
  def hmac(s: SparkSession, d: String): DataFrame = {
    val e = Tables.par(Tables.events(s, d))
    val body = to_json(struct(lit("e").as("event"), col("event_id").cast("string").as("distinct_id")))
    val signedOver = when(col("event_id") % 7 === 0, concat(body, lit("tampered"))).otherwise(body)
    val sig = concat(lit("sha256="), Codecs.hmacSha256Udf(lit("top-secret"), signedOver.cast("binary")))
    e.select(col("event_id"),
        Codecs.verifySigUdf(lit("top-secret"), body.cast("binary"), sig).as("valid"))
  }

  val hmacSql: String =
    "SELECT event_id, event_id % 7 <> 0 AS valid FROM events"

  /** Q-ING-6: group slot mapping — `$groups` map pivoted into the five
    * configured positional columns (lib.rs:1378-1391).
    */
  def groups(s: SparkSession, d: String): DataFrame = {
    val e = Tables.par(Tables.events(s, d))
    val body = to_json(struct(
      lit("e").as("event"),
      col("event_id").cast("string").as("distinct_id"),
      struct(struct(
        concat(lit("c"), col("user_id") % 3).as("company"),
        concat(lit("t"), col("user_id") % 5).as("team")).as("$groups")).as("properties")))
    Normalizer.ingest(e.select(body.as("body")), col("body"), IngestContext())
      .select(col("distinct_id").cast(LongType).as("event_id"),
        col("group0"), col("group1"), col("group2"))
  }

  val groupsSql: String =
    """SELECT event_id, 'c' || (user_id % 3) AS group0, 't' || (user_id % 5) AS group1,
      |  NULL::VARCHAR AS group2
      |FROM events""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_ingest_capture", capture, Some(captureSql)),
    Q("q_ingest_wire", wire, Some(wireSql)),
    Q("q_ingest_batch", batch, Some(batchSql)),
    Q("q_ingest_enrich", enrichQ, Some(enrichSql)),
    Q("q_ingest_hmac", hmac, Some(hmacSql)),
    Q("q_ingest_groups", groups, Some(groupsSql)))
}
