package graft

import org.apache.spark.sql.SparkSession

/** Bench main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Each query executes into the `noop` sink — unlike `count()`, this
  * computes every projected column (column pruning can't hollow out the
  * measurement) while writing nothing. One JVM-warmup query runs first;
  * timings are per-query wall clock on a warm session.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JVM/codegen warmup on the smallest table
    try run(SparkEntry.queries("q_scan_count")(spark, sfDir)) catch { case _: Throwable => }
    // materialize synthesized wire-payload inputs outside the timers so
    // ingest timings measure decode+normalize, not the test-data generator
    try graft.ingest.IngestQueries.prepare(spark, sfDir) catch { case _: Throwable => }
    try graft.state.StateQueries.prepare(spark, sfDir) catch { case _: Throwable => }
    // warm-scratch gate: a cold scratch means timers would measure the
    // generator, not the engine — fail loudly instead of recording junk
    val cold = Tables.coldScratch(sfDir)
    require(cold.isEmpty, s"scratch inputs not materialized: ${cold.mkString(",")}")
    Tables.releaseCaches(spark)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      // reclaim per-query persisted blocks: timings stay independent —
      // no eviction churn from blocks a finished query left behind
      Tables.releaseCaches(spark)
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
