package graft.streaming

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked batch-equivalents of the streaming transforms: the
  * exact same `Streaming.*` builders run over the batch events table
  * (Spark executes `window`/`session_window` identically in batch and
  * micro-batch; StreamingSpec separately proves batch↔stream parity on
  * MemoryStream). The DuckDB oracle recomputes windows arithmetically.
  */
object StreamQueries {

  /** Delivery-batch count for the driver-checked streaming harnesses.
    * The late/funnel ORACLES model this exact split closed-form
    * (`rk // (nn // 3 + 1)`), so it is a constant, not a parameter.
    */
  private val Chunks = 3

  /** The one chunk-split formula the oracles mirror: `Chunks`
    * event-time-ordered slices of `ceil`-ish size n/Chunks + 1.
    */
  private def chunk3[A](rows: Seq[A]): Seq[Seq[A]] =
    rows.grouped(math.max(1, rows.length / Chunks + 1)).toSeq

  /** The one straggler-injection policy the late/funnel/paths oracles
    * mirror closed-form: every `eid % 13 == 0` row is withheld from its
    * own chunk and delivered one batch late; the final batch carries
    * the last chunk's stragglers plus the watermark-advancing sentinel.
    */
  private def stragglerBatches[A](rows: Seq[A], eid: A => Long,
      sentinel: A): Seq[Seq[A]] = {
    val chunked = chunk3(rows)
    (0 to chunked.length).map { i =>
      val onTime = if (i < chunked.length) chunked(i).filter(e => eid(e) % 13 != 0)
        else Seq(sentinel)
      val stragglers = if (i == 0) Nil
        else chunked(i - 1).filter(e => eid(e) % 13 == 0)
      onTime ++ stragglers
    }
  }

  /** Shared MemoryStream harness loop: feed `batches` through `build`'s
    * streaming query one micro-batch at a time (processing all
    * available between), return the Append-mode sink contents
    * (localCheckpointed so the memory table can be dropped). The
    * callers own chunking/straggler/sentinel policy — this owns the
    * delicate sink/loop/cleanup plumbing.
    */
  /** Shuffle/state partition count for the MemoryStream drive loops.
    * Every stateful operator materializes one state-store instance PER
    * shuffle partition PER micro-batch — at the harness's ~100k-row
    * micro-batches, 32 partitions means the floor is state-store
    * open/commit and task scheduling, not data. 8 keeps the plan
    * multi-partition (partition-invariance still exercised) at a
    * fraction of the per-batch overhead. A production deployment sizes
    * this to the cluster (state scales out with partitions); this
    * constant is harness-scale tuning, not a semantics knob — the
    * oracle gates prove results are partition-count-invariant.
    */
  private val DrivePartitions = 8

  private def driveBatches[A: org.apache.spark.sql.Encoder](
      s: SparkSession, batches: Seq[Seq[A]], cols: Seq[String],
      build: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[A]
    val name = "sink_" + java.lang.Long.toHexString(System.nanoTime())
    // the streaming query fixes its shuffle-partition count at start;
    // restore the session conf right after so downstream batch rollups
    // keep the session's parallelism
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", DrivePartitions.toString)
    val q = try {
      build(mem.toDF().toDF(cols: _*))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = try {
      batches.foreach { b =>
        mem.addData(b: _*)
        // metered as "data": the actual micro-batch execution — Bench
        // separates this from the harness/transport floor (PhaseMeter)
        graft.PhaseMeter.time("data")(q.processAllAvailable())
        graft.StateMeter.record(q)
      }
      s.table(name).localCheckpoint(true)
    } finally { q.stop() }
    s.sql(s"DROP TABLE IF EXISTS $name")
    out
  }

  /** Q-STR-0: daily trends series, the incrementalizable form — see
    * [[Streaming.trendsDaily]] (keyed dedup + one conditional rollup
    * instead of a distinct aggregate; StreamingSpec pins MemoryStream
    * parity). Unlike `q_prod_trends` there is no zero-fill grid: a
    * live series emits only days with data.
    */
  def trends(s: SparkSession, d: String): DataFrame =
    Streaming.trendsDaily(Tables.events(s, d))

  val trendsSql: String =
    """WITH u AS (
      |  SELECT CAST(ts AS DATE) AS day, 'p' AS tag FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT day, 'v' AS tag FROM (
      |    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |    WHERE event_type = 'view')),
      |r AS (
      |  SELECT day,
      |    count(*) FILTER (WHERE tag = 'p')::BIGINT AS purchases,
      |    count(*) FILTER (WHERE tag = 'v')::BIGINT AS viewers
      |  FROM u GROUP BY day)
      |SELECT day, purchases, viewers,
      |  CASE WHEN viewers = 0 THEN NULL
      |       ELSE purchases::DOUBLE / viewers END AS ratio,
      |  purchases - viewers AS net
      |FROM r""".stripMargin

  /** Q-STR-1: tumbling 6h windows (epoch-aligned). */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Streaming.tumblingCounts(Tables.events(s, d))

  val tumblingSql: String =
    """SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS window_start_us,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Q-STR-2: sliding 6h/3h windows — each event lands in 2 windows. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Streaming.slidingCounts(Tables.events(s, d))

  val slidingSql: String =
    """WITH shifted AS (
      |  SELECT ((epoch_us(ts) - off) // 21600000000) * 21600000000 + off AS window_start_us,
      |    event_type
      |  FROM events, unnest([0, 10800000000]) AS o(off))
      |SELECT window_start_us, event_type, count(*) AS n
      |FROM shifted GROUP BY 1, 2""".stripMargin

  /** Q-STR-3: per-user 30-minute-gap session windows (start/end/n/sum);
    * oracle = lag/cumsum sessionization (new session when the gap to
    * the previous event is ≥ the inactivity gap; end = last ts + gap).
    */
  def sessions(s: SparkSession, d: String): DataFrame =
    Streaming.sessionize(Tables.events(s, d))

  val sessionsSql: String =
    """WITH g AS (
      |  SELECT user_id, value, epoch_us(ts) AS ts_us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM g)
      |SELECT min(ts_us) AS session_start_us,
      |  max(ts_us) + 1800000000 AS session_end_us,
      |  user_id, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sess_id""".stripMargin

  /** Q-STR-4: view→purchase attribution via the stream-stream interval
    * join — purchases by the same user within 30 minutes after a view.
    * Same builder as the streaming form (StreamingSpec pins MemoryStream
    * parity); the oracle recomputes the pairing as a plain range join.
    */
  def joined(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    Streaming.intervalJoin(
      e.filter(col("event_type") === "view"),
      e.filter(col("event_type") === "purchase"))
  }

  val joinedSql: String =
    """SELECT v.user_id,
      |  v.event_id AS left_id, epoch_us(v.ts) AS left_ts_us,
      |  p.event_id AS right_id, epoch_us(p.ts) AS right_ts_us,
      |  CAST(CAST(p.value AS DECIMAL(14,2)) AS DOUBLE) AS right_value
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND epoch_us(p.ts) < epoch_us(v.ts) + 1800000000
      |WHERE v.event_type = 'view' AND p.event_type = 'purchase'""".stripMargin

  /** Q-STR-5 (streaming LSH admission gate, driver-checked): the
    * keyed-state gate [[Streaming.lshGateStream]] run through REAL
    * micro-batches — documents' MinHash band rows arrive in 3
    * doc-ascending chunks over a MemoryStream, the per-bucket
    * first-claimer state carries across batches, and the emitted
    * (doc, band, owner) rows roll up to the admission verdicts. Oracle:
    * the identical closed form as the batch gate
    * ([[graft.llm.Dedup.lshGateSql]]) — streaming == batch is the
    * operator's contract (StreamingSpec pins it per split; this row
    * makes the driver hash-check the streaming execution itself, the
    * [[graft.state.StateQueries.pipeStreamMerge]] precedent).
    *
    * The driver-side band-row hop is the MemoryStream HARNESS
    * transport, not the operator's shape: rows are compact
    * (long,int,long) tuples (~40 K at sf0.1), and a production
    * deployment reads the same band rows from `readStream` against the
    * lake/commit log with the gate unchanged.
    */
  def lshGate(s: SparkSession, d: String, chunks: Int = 3): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // budget-gated harness collect (the collectBudgeted discipline): a
    // count probe FIRST, collect only if the ~24 B/row band table fits
    // the driver budget — a giant-sf Bench run fails loudly here rather
    // than silently pressuring the driver
    val bandsDf = graft.llm.Dedup.minhashBands(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRows = bandsDf.count()
    require(nRows * 24L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming LSH gate harness: $nRows band rows exceed the MemoryStream driver " +
        s"budget (${graft.state.IdentityResolver.LocalHeapBudget >> 20} MiB); at this scale " +
        "feed the gate from readStream against the lake instead of the harness transport.")
    val bandRows = graft.HeapWatermark.recordRows("stream_harness.lsh_bands",
      bandsDf.collect()).map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    bandsDf.unpersist()
    val mem = MemoryStream[(Long, Int, Long)]
    val name = "lsh_gate_sink_" + java.lang.Long.toHexString(System.nanoTime())
    val q = Streaming.lshGateStream(mem.toDS()).toDF("doc_id", "band", "owner")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    val emissions = try {
      val docs = bandRows.map(_._1).distinct.sorted
      docs.grouped(math.max(1, docs.length / chunks + 1)).foreach { ch =>
        val in = ch.toSet
        mem.addData(bandRows.filter(t => in(t._1)).toSeq: _*)
        graft.PhaseMeter.time("data")(q.processAllAvailable())
        graft.StateMeter.record(q)
      }
      graft.HeapWatermark.recordRows("stream_harness.sink",
        s.table(name).as[(Long, Int, Long)].collect())
    } finally { q.stop(); s.sql(s"DROP TABLE IF EXISTS $name") }
    // one shared verdict definition with the batch gate and its oracle
    graft.llm.Dedup.gateVerdicts(
      s.createDataset(emissions.toSeq).toDF("doc_id", "band", "owner"))
  }

  /** Q-STR-6 (streaming priority sample, driver-checked): the O(k)-state
    * online sampler [[Streaming.prioritySampleStream]] run through REAL
    * micro-batches — the (doc_id, w) population arrives in 3 chunks over
    * a MemoryStream, and the LATEST emitted sample (max state version)
    * is returned in the batch operator's column shape. The oracle is the
    * BATCH priority-sample SQL: the stream must land on the batch
    * operator's rows verbatim, whatever the batch split.
    */
  def sample(s: SparkSession, d: String, chunks: Int = 3): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // collectBudgeted discipline: 16 B/row (two longs), count probe first
    val wDf = graft.llm.Corpus.sampleWeights(s, d)
    val nRows = wDf.count()
    require(nRows * 16L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming sample harness: $nRows weight rows exceed the MemoryStream driver " +
        s"budget (${graft.state.IdentityResolver.LocalHeapBudget >> 20} MiB); at this scale " +
        "feed the sampler from readStream against the lake instead of the harness transport.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.sample_weights",
      wDf.collect()).map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val name = "sample_sink_" + java.lang.Long.toHexString(System.nanoTime())
    val q = Streaming.prioritySampleStream(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    val picks = try {
      rows.sortBy(_._1).grouped(math.max(1, rows.length / chunks + 1)).foreach { ch =>
        mem.addData(ch.toSeq: _*)
        graft.PhaseMeter.time("data")(q.processAllAvailable())
        graft.StateMeter.record(q)
      }
      graft.HeapWatermark.recordRows("stream_harness.sink",
        s.table(name).as[Streaming.SamplePick].collect())
    } finally { q.stop(); s.sql(s"DROP TABLE IF EXISTS $name") }
    val last = if (picks.isEmpty) 0L else picks.map(_.ver).max
    s.createDataset(picks.filter(_.ver == last).toSeq)
      .select(col("doc_id"), col("w"), col("priority"), col("tau"), col("est_w"))
  }

  /** Q-STR-7 (streaming exactly-once dedup, driver-checked): the
    * watermarked dedup [[Streaming.dedupStream]] run through REAL
    * micro-batches with client-retry REDELIVERIES injected — events
    * arrive in 3 time-ordered chunks, every `event_id % 7 == 0` event
    * is re-sent in the NEXT chunk (cross-batch retry) and every
    * `% 11 == 0` twice within its own chunk (in-batch retry). The
    * emitted stream must be exactly the original event set (ids are
    * unique), so the per-type rollup of the emissions hash-matches the
    * oracle computed over the CLEAN batch table — duplicate leakage
    * shows as an inflated count.
    *
    * The 45-day horizon is a HARNESS artifact: three chunks compress
    * a month of event time into seconds, so the redelivery horizon
    * must cover a chunk span (~10 days of event time). In production
    * the same operator runs with a minutes-scale horizon (the real
    * retry window) and state is bounded by redelivery lag × ingest
    * rate, not stream length — the 100 TB/day shape.
    */
  def dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // collectBudgeted discipline: ~64 B/row, count probe first
    val evDf = Tables.events(s, d)
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"), col("value"))
    val nRows = evDf.count()
    require(nRows * 64L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming dedup harness: $nRows event rows exceed the MemoryStream driver " +
        s"budget (${graft.state.IdentityResolver.LocalHeapBudget >> 20} MiB); at this scale " +
        "feed the dedup from readStream against the wire log instead of the harness transport.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.events",
      evDf.collect()).map(r =>
      (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(_._2) // event ids are time-monotone: chunks arrive in event-time order
    val chunked = chunk3(rows)
    val batches = chunked.zipWithIndex.map { case (ch, i) =>
      val inBatchDups = ch.filter(_._2 % 11 == 0)
      val retries = if (i == 0) Seq.empty[(java.sql.Timestamp, Long, Long, String, Double)]
        else chunked(i - 1).filter(_._2 % 7 == 0)
      ch ++ inBatchDups ++ retries
    }
    driveBatches(s, batches, Seq("ts", "event_id", "user_id", "event_type", "value"),
        Streaming.dedupStream(_, key = "event_id", horizon = "45 days"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
  }

  /** Q-STR-8 (streaming late-data audit, driver-checked): watermarked
    * daily counts [[Streaming.watermarkedCounts]] run through REAL
    * micro-batches with STRAGGLERS injected — events arrive in 3
    * time-ordered chunks, but every `event_id % 13 == 0` event is
    * withheld from its own chunk and delivered one batch late (a
    * ~10-day straggle against a 2-day watermark). Spark drops a late
    * row iff its window END has passed the watermark (`end <= wm`, ms
    * truncation — pinned by StreamingSpec's boundary probe); the
    * result reconciles the stream against the lake: per (day, type),
    * rows fed, rows the watermarked agg kept, rows dropped. The oracle
    * recomputes the drop rule closed-form from the deterministic chunk
    * assignment — a drift in watermark semantics hash-mismatches.
    *
    * This is the observability HALF of the watermark trade: the delay
    * bounds state (2 days × ingest rate, not stream length — the
    * 100 TB/day shape), and this audit makes what the bound DISCARDS a
    * first-class, queryable number instead of silent data loss.
    */
  def late(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val DayUs = 86400000000L
    val evDf = Tables.events(s, d)
      .select(col("ts"), col("event_id"), col("event_type"))
    val nRows = evDf.count()
    require(nRows * 48L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"late-audit harness: $nRows event rows exceed the MemoryStream driver budget; " +
        "at this scale feed the audit from readStream against the wire log instead.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.events",
      evDf.collect()).map(r =>
      (r.getTimestamp(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2) // event ids are time-monotone: chunks arrive in event-time order
    val maxTs = rows.last._1
    val sentinel = (new java.sql.Timestamp(maxTs.getTime + 365L * 86400000L), -1L, "flush")
    val batches = stragglerBatches(rows.toSeq, (e: (java.sql.Timestamp, Long, String)) => e._2, sentinel)
    val kept = driveBatches(s, batches, Seq("ts", "event_id", "event_type"),
        Streaming.watermarkedCounts(_, windowLen = "1 day", delay = "2 days"))
      .filter(col("event_type") =!= "flush")
    val fed = evDf
      .groupBy(
        (expr(s"unix_micros(ts) div $DayUs") * DayUs).as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_fed"))
    fed.join(kept, Seq("window_start_us", "event_type"), "left")
      .select(col("window_start_us"), col("event_type"), col("n_fed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_fed") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Q-STR-9 (streaming funnel, driver-checked): the keyed-state funnel
    * [[Streaming.funnelStream]] run through REAL micro-batches with the
    * same straggler injection as [[late]] (`event_id % 13` delivered one
    * chunk late) — an out-of-order EARLIER step must re-anchor the
    * greedy chain, which is exactly what the buffer-until-settled state
    * design exists for. Oracle: the batch funnel's own SQL
    * ([[graft.queries.Product.funnelSql]]) — streaming == batch is the
    * operator's contract, hash-checked by the driver per user row.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evDf = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"))
    val nRows = evDf.count()
    require(nRows * 56L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming funnel harness: $nRows event rows exceed the MemoryStream driver " +
        "budget; at this scale feed the funnel from readStream against the wire log.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.events",
      evDf.collect()).map(r =>
      (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._2) // event ids are time-monotone: chunks arrive in event-time order
    val maxTs = rows.map(_._1.getTime).max
    // the sentinel view (user -1) advances the watermark a year past the
    // corpus so every settle timer fires; its own timer never does
    val sentinel = (new java.sql.Timestamp(maxTs + 365L * 86400000L),
      Long.MaxValue, -1L, "view")
    val batches = stragglerBatches(rows.toSeq,
      (e: (java.sql.Timestamp, Long, Long, String)) => e._2, sentinel)
    driveBatches(s, batches, Seq("ts", "event_id", "user_id", "event_type"),
        Streaming.funnelStream(_).toDF())
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("view_eid"), col("click_eid"),
        col("purchase_eid"), col("steps_reached"))
  }

  /** Q-STR-10 (streaming paths, driver-checked): consecutive-pair edges
    * emitted from keyed state [[Streaming.pathEdgesStream]] under the
    * usual straggler injection — a late event must INSERT into the
    * middle of the user's sequence (splitting the edge that spanned the
    * gap), which buffering handles and running-lag state cannot — then
    * rolled up to the transition matrix with the batch query's own
    * rollup. Oracle: `q_prod_paths_markov`'s SQL verbatim — streaming
    * == batch is the contract.
    */
  def paths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evDf = Tables.events(s, d)
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"))
    val nRows = evDf.count()
    require(nRows * 56L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming paths harness: $nRows event rows exceed the MemoryStream driver " +
        "budget; at this scale feed the edges from readStream against the wire log.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.events",
      evDf.collect()).map(r =>
      (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._2) // event ids are time-monotone: chunks arrive in event-time order
    val maxTs = rows.map(_._1.getTime).max
    val sentinel = (new java.sql.Timestamp(maxTs + 365L * 86400000L),
      Long.MaxValue, -1L, "flush")
    val batches = stragglerBatches(rows.toSeq,
      (e: (java.sql.Timestamp, Long, Long, String)) => e._2, sentinel)
    val edges = driveBatches(s, batches, Seq("ts", "event_id", "user_id", "event_type"),
        Streaming.pathEdgesStream(_).toDF())
      .filter(col("user_id") =!= -1L)
    graft.queries.Product.markovOver(
      edges.select(col("from_type"), col("to_type")))
  }

  /** Q-STR-11 (streaming anomaly alerting, driver-checked): the daily
    * volume series maintained by a watermarked 1-day tumbling window
    * ([[Streaming.dailyTotals]]) run through REAL micro-batches with
    * the usual straggler injection, then the shared 3σ integer verdict
    * ([[graft.queries.Product.anomalyVerdict]]) evaluated over the
    * finalized series. The watermark delay (45 days) is wider than the
    * corpus span, so no straggler is ever dropped and the finalized
    * counts equal the batch rollup exactly; the far-future sentinel
    * advances the watermark past every real day (its own window never
    * finalizes, so it needs no filtering). Oracle:
    * `q_prod_anomaly`'s SQL verbatim — streaming == batch is the
    * alerting contract.
    */
  def anomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evDf = Tables.events(s, d).select(col("ts"), col("event_id"))
    val nRows = evDf.count()
    require(nRows * 24L <= graft.state.IdentityResolver.LocalHeapBudget,
      s"streaming anomaly harness: $nRows event rows exceed the MemoryStream driver " +
        "budget; at this scale feed the rollup from readStream against the wire log.")
    val rows = graft.HeapWatermark.recordRows("stream_harness.events",
      evDf.collect()).map(r => (r.getTimestamp(0), r.getLong(1)))
      .sortBy(_._2) // event ids are time-monotone: chunks arrive in event-time order
    val maxTs = rows.map(_._1.getTime).max
    // The streaming == batch contract silently depends on the fixture
    // span staying under the watermark delay: a one-chunk-late straggler
    // can be up to the full corpus span late, and past the delay it
    // would be DROPPED — the oracle gate would then fail as a confusing
    // count mismatch. Make the precondition loud instead (one day of
    // margin for the window-end vs event-time offset).
    val minTs = rows.map(_._1.getTime).min
    val spanDays = (maxTs - minTs) / 86400000L
    require(spanDays <= 44L,
      s"streaming anomaly harness: events span $spanDays days but the 45-day " +
        "watermark only guarantees no-straggler-dropped (streaming == batch) " +
        "below it; widen the delay in Streaming.dailyTotals' caller to cover " +
        "the fixture span plus margin.")
    val sentinel = (new java.sql.Timestamp(maxTs + 365L * 86400000L), -1L)
    val batches = stragglerBatches(rows.toSeq,
      (e: (java.sql.Timestamp, Long)) => e._2, sentinel)
    graft.queries.Product.anomalyVerdict(
      driveBatches(s, batches, Seq("ts", "event_id"),
        Streaming.dailyTotals(_, delay = "45 days")))
  }

  val lateSql: String =
    """WITH o AS (
      |  SELECT epoch_us(ts) AS ts_us, event_id, event_type,
      |    row_number() OVER (ORDER BY event_id) - 1 AS rk,
      |    count(*) OVER () AS nn
      |  FROM events),
      |c AS (SELECT *, rk // (nn // 3 + 1) AS ch FROM o),
      |wm AS (
      |  SELECT ch, max(ts_us) AS mx FROM c
      |  WHERE event_id % 13 <> 0 GROUP BY ch),
      |a AS (
      |  SELECT c.ts_us, c.event_type,
      |    (c.ts_us // 86400000000 + 1) * 86400000000 AS wend,
      |    w.mx
      |  FROM c LEFT JOIN wm w
      |    ON w.ch = CASE WHEN c.event_id % 13 = 0 THEN c.ch ELSE c.ch - 1 END),
      |v AS (
      |  SELECT *, (mx IS NOT NULL
      |    AND wend <= (mx // 1000 - 172800000) * 1000) AS dropped
      |  FROM a)
      |SELECT (ts_us // 86400000000) * 86400000000 AS window_start_us, event_type,
      |  count(*)::BIGINT AS n_fed,
      |  (count(*) FILTER (WHERE NOT dropped))::BIGINT AS n_kept,
      |  (count(*) FILTER (WHERE dropped))::BIGINT AS n_dropped
      |FROM v GROUP BY 1, 2""".stripMargin

  val dedupSql: String =
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_stream_trends", trends, Some(trendsSql)),
    Q("q_stream_tumbling", tumbling, Some(tumblingSql)),
    Q("q_stream_sliding", sliding, Some(slidingSql)),
    Q("q_stream_sessions", sessions, Some(sessionsSql)),
    Q("q_stream_join", joined, Some(joinedSql)),
    Q("q_stream_lsh_gate", (s, d) => lshGate(s, d), Some(graft.llm.Dedup.lshGateSql)),
    Q("q_stream_sample", (s, d) => sample(s, d), Some(graft.llm.Corpus.weightedSampleSql)),
    Q("q_stream_dedup", dedup, Some(dedupSql)),
    Q("q_stream_late", late, Some(lateSql)),
    Q("q_stream_funnel", funnel, Some(graft.queries.Product.funnelSql)),
    Q("q_stream_paths", paths, Some(graft.queries.Product.pathsMarkovSql)),
    Q("q_stream_anomaly", anomaly, Some(graft.queries.Product.anomalySql)))
}
