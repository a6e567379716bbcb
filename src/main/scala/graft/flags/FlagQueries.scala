package graft.flags

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked drives of the vectorized flag engine (Q-FLAG-1):
  * a person table derived from `customer`, a fixed flag config
  * exercising the full operator matrix, evaluated with the REAL
  * [[FlagColumns]] builders; the oracle recomputes expectations as
  * plain SQL.
  *
  * The SHA1 rollout bucket is NOT SQL-expressible in the oracle engine
  * (no sha1()), so bucketing correctness is pinned by unit vectors
  * generated with an independent implementation (FlagSpec), and the
  * rollout query ships without an oracle (rows-only driver check).
  */
object FlagQueries {

  /** Person dimension: distinct_id + merged-properties map. */
  private def persons(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      concat(lit("cust-"), col("c_custkey")).as("distinct_id"),
      col("c_custkey"),
      map(
        lit("segment"), col("c_mktsegment"),
        lit("balance"), col("c_acctbal").cast("string"),
        lit("name"), col("c_name"),
        lit("nation"), col("c_nationkey").cast("string")).as("props"))

  private val flagConfigJson: String =
    """{"flags": [
      |  {"key": "f_eq", "conditions": [{"properties": [{"key": "segment", "value": "BUILDING"}]}]},
      |  {"key": "f_in", "conditions": [{"properties": [{"key": "segment", "operator": "in", "value": ["AUTOMOBILE", "MACHINERY"]}]}]},
      |  {"key": "f_not_in", "conditions": [{"properties": [{"key": "segment", "operator": "not_in", "value": ["HOUSEHOLD"]}]}]},
      |  {"key": "f_gt", "conditions": [{"properties": [{"key": "balance", "operator": "gt", "value": 5000}]}]},
      |  {"key": "f_lte", "conditions": [{"properties": [{"key": "nation", "operator": "lte", "value": "11"}]}]},
      |  {"key": "f_contains", "conditions": [{"properties": [{"key": "name", "operator": "contains", "value": "00001"}]}]},
      |  {"key": "f_regex", "conditions": [{"properties": [{"key": "name", "operator": "regex", "value": "[02468]$"}]}]},
      |  {"key": "f_is_set", "conditions": [{"properties": [{"key": "missing_key", "operator": "is_set", "value": null}]}]},
      |  {"key": "f_is_not", "conditions": [{"properties": [{"key": "segment", "operator": "is_not", "value": "FURNITURE"}]}]},
      |  {"key": "f_and", "conditions": [{"properties": [
      |      {"key": "segment", "value": "BUILDING"},
      |      {"key": "balance", "operator": "gte", "value": 0}]}]},
      |  {"key": "f_multi_cond", "conditions": [
      |      {"properties": [{"key": "segment", "value": "MACHINERY"}]},
      |      {"properties": [{"key": "balance", "operator": "lt", "value": 0}]}]},
      |  {"key": "f_inactive", "active": false, "conditions": [{"properties": [{"key": "segment", "operator": "is_set", "value": null}]}]}
      |]}""".stripMargin

  /** The parsed store (F1 parse exercised on every run). */
  def config: Seq[FeatureFlag] = FlagStore.fromJson(flagConfigJson)

  /** Q-FLAG-1: property-operator matrix over the person table —
    * 12 flags (eq/in/not_in/gt/lte/contains/regex/is_set/is_not,
    * AND-of-filters, multi-condition first-match, inactive) with 100%
    * rollout so the oracle can verify pure filter semantics.
    */
  def flagFilters(s: SparkSession, d: String): DataFrame = {
    val p = persons(s, d)
    val cols = config.map(f =>
      FlagColumns.enabledCol(col("distinct_id"), col("props"), f).as(f.key))
    p.select(col("c_custkey") +: cols: _*)
  }

  val flagFiltersSql: String =
    """SELECT c_custkey,
      |  c_mktsegment = 'BUILDING' AS f_eq,
      |  c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') AS f_in,
      |  c_mktsegment NOT IN ('HOUSEHOLD') AS f_not_in,
      |  c_acctbal > 5000 AS f_gt,
      |  c_nationkey <= 11 AS f_lte,
      |  contains(c_name, '00001') AS f_contains,
      |  regexp_matches(c_name, '[02468]$') AS f_regex,
      |  false AS f_is_set,
      |  c_mktsegment <> 'FURNITURE' AS f_is_not,
      |  (c_mktsegment = 'BUILDING' AND c_acctbal >= 0) AS f_and,
      |  (c_mktsegment = 'MACHINERY' OR c_acctbal < 0) AS f_multi_cond,
      |  false AS f_inactive
      |FROM customer""".stripMargin

  /** Q-FLAG-2: rollout bucketing + variant distribution (SHA1; no SQL
    * oracle — bit-exactness pinned by FlagSpec vectors; driver records
    * rows>0). Buckets must be uniform-ish: the output is the per-bucket
    * histogram a cohort analysis would read.
    */
  def flagRollout(s: SparkSession, d: String): DataFrame = {
    val p = persons(s, d)
    p.select(FlagColumns.bucketUdf(lit("beta-flag"), col("distinct_id")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(
    Q("q_flag_filters", flagFilters, Some(flagFiltersSql)),
    Q("q_flag_rollout", flagRollout, None))
}
