package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VariantType experiment (SURVEY §1.2, VERDICT r13 item 4): measure
  * Spark 4's `VariantType` against the committed
  * string+`get_json_object`(+JsonFusion) path for the JSON payload
  * probes the props-heavy queries pay (`q_scan_drift`, `q_fn_json`,
  * `q_flag_cohort` all reduce to k-key probes of `props`).
  *
  * Three storage/probe strategies × two probe widths, timed over the
  * full events table into the noop sink, 3 reps, min per cell:
  *
  *   - `string`: props at rest as the parquet string it is today;
  *     probe via `get_json_object` (JsonFusion collapses repeated
  *     probes of one row into a shared parse).
  *   - `inline_variant`: `parse_json(props)` in the query, probe via
  *     `variant_get` — what a query could do today with no storage
  *     change (pays parse per row per query, but ONE parse feeds all
  *     probes).
  *   - `stored_variant`: props parsed ONCE at ingest into a
  *     variant-typed parquet column (materialized to scratch outside
  *     the timers); probe via `variant_get` — the real "adopt Variant"
  *     shape, where the per-query parse disappears entirely.
  *
  * Run: SPARK_GRAFT_SF_DIR=… runMain graft.VariantProbe
  * Emits one JSON line; the keep/revert decision is recorded in
  * SURVEY §4 with the measured numbers.
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, sfDir)

    // at-rest variant column, materialized once outside the timers
    // (ingest-time parse — the cost Variant adoption moves out of
    // every query)
    val vDf = Tables.scratch(spark, sfDir, "variant_props") {
      events.select(col("event_id"), col("event_type"), col("user_id"),
        parse_json(col("props")).as("pv"))
    }

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the probe sets: 1 key (the q_scan_drift shape) and the same key
    // re-probed 4× under different casts/uses (the q_flag_cohort /
    // q_fn_json shape JsonFusion was built for)
    val cells: Seq[(String, () => DataFrame)] = Seq(
      "string_1probe" -> (() => events.select(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("s"))),
      "string_4probe" -> (() => events.select(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("a"),
        max(get_json_object(col("props"), "$.k").cast("long")).as("b"),
        count(when(get_json_object(col("props"), "$.k").cast("long") % 2 === 0, 1)).as("c"),
        avg(get_json_object(col("props"), "$.k").cast("double")).as("d"))),
      "inline_variant_1probe" -> (() => events.select(
        sum(variant_get(parse_json(col("props")), "$.k", "long")).as("s"))),
      "inline_variant_4probe" -> (() => events
        .select(parse_json(col("props")).as("pv"))
        .select(
          sum(variant_get(col("pv"), "$.k", "long")).as("a"),
          max(variant_get(col("pv"), "$.k", "long")).as("b"),
          count(when(variant_get(col("pv"), "$.k", "long") % 2 === 0, 1)).as("c"),
          avg(variant_get(col("pv"), "$.k", "double")).as("d"))),
      "stored_variant_1probe" -> (() => vDf.select(
        sum(variant_get(col("pv"), "$.k", "long")).as("s"))),
      "stored_variant_4probe" -> (() => vDf.select(
        sum(variant_get(col("pv"), "$.k", "long")).as("a"),
        max(variant_get(col("pv"), "$.k", "long")).as("b"),
        count(when(variant_get(col("pv"), "$.k", "long") % 2 === 0, 1)).as("c"),
        avg(variant_get(col("pv"), "$.k", "double")).as("d"))))

    // correctness cross-check before timing: all three strategies must
    // agree on the 1-probe sum
    val expect = HeapWatermark.recordRows("variant_probe.crosscheck",
      cells.head._2().collect())(0).getLong(0)
    Seq(2, 4).foreach { i =>
      val got = HeapWatermark.recordRows("variant_probe.crosscheck",
        cells(i)._2().collect())(0).getLong(0)
      require(got == expect, s"${cells(i)._1} sum $got != string sum $expect")
    }

    val reps = 3
    val results = cells.map { case (name, mk) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run(mk())
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val js = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
    println(s"""{"metric":"variant_probe","sf":"$sfDir",$js}""")
    spark.stop()
  }
}
