package graft.ingest

import org.apache.spark.sql.types._

/** The canonical 21-column event envelope — the single fact-table schema
  * every wire format normalizes into.
  *
  * Mirrors the reference's lake schema (`/root/reference/README.md:57-84`)
  * and in-memory struct (`/root/reference/src/pipeline.rs:146-183`):
  * fixed envelope, dynamic JSON payloads kept as JSON strings
  * (`properties`, `context`, `person_properties`, `group_properties`),
  * unknown top-level keys routed into the `extra` map
  * (`/root/reference/src/models.rs:19-21` serde-flatten behavior).
  *
  * At rest this is a columnar lake table partitioned by
  * `days(created_at)`; the JSON payload columns are read with
  * `get_json_object`/`from_json`/`parse_json(variant)` at query time —
  * PostHog-style payloads are adversarially heterogeneous, so schema
  * inference is deliberately avoided.
  */
object EventSchema {

  val schema: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("team_id", LongType),
    StructField("source", StringType, nullable = false),
    StructField("event", StringType, nullable = false),
    StructField("distinct_id", StringType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("created_at", TimestampType, nullable = false),
    StructField("properties", StringType),
    StructField("context", StringType),
    StructField("person_id", StringType),
    StructField("person_created_at", TimestampType),
    StructField("person_properties", StringType),
    StructField("group0", StringType),
    StructField("group1", StringType),
    StructField("group2", StringType),
    StructField("group3", StringType),
    StructField("group4", StringType),
    StructField("group_properties", StringType),
    StructField("api_key", StringType),
    StructField("extra", MapType(StringType, StringType))))

  /** Positional group-slot types (reference `POSTHOG_GROUP_TYPE_0..4`,
    * `/root/reference/src/config.rs:87-93`).
    */
  val defaultGroupTypes: Seq[String] =
    Seq("company", "team", "org", "project", "workspace")
}
