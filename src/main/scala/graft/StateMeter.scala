package graft

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-query streaming STATE-SIZE accumulator (VERDICT r14 #8): the
  * bench artifact carries driver-heap watermarks, but the number that
  * decides whether a keyed stream survives 100 TB is the STATE
  * STORE's size trajectory across epochs. The harness drive loops
  * call [[record]] after each micro-batch; the meter keeps the
  * per-run HIGH-WATER of every state operator's rows and bytes (plus
  * RocksDB SST bytes when that provider is active — the same numbers
  * `StreamingQueryProgress.stateOperators` reports on a production
  * cluster), and Bench emits them per query as `stream_state` in the
  * artifact. A stream whose watermark/TTL eviction works shows a
  * bounded rows high-water; unbounded growth reads as rows ≈ total
  * keys fed (StreamingSpec pins the eviction bound for the keyed
  * dedup stream under both state-store providers).
  *
  * Thread-safe; one `lastProgress` read per micro-batch.
  */
object StateMeter {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Fold the query's last micro-batch progress into the high-waters. */
  def record(q: StreamingQuery): Unit = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
    if (ops.nonEmpty) {
      def hi(k: String, v: Long): Unit =
        acc.merge(k, v, (a, b) => java.lang.Long.valueOf(math.max(a, b)))
      hi("rows", ops.map(_.numRowsTotal).sum)
      hi("bytes", ops.map(_.memoryUsedBytes).sum)
      val sst = ops.map(o =>
        Option(o.customMetrics.get("rocksdbSstFileSize"))
          .map(_.longValue).getOrElse(0L)).sum
      if (sst > 0) hi("sst_bytes", sst)
    }
  }

  def reset(): Unit = acc.clear()

  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.longValue() }.toMap
  }
}
