package graft

/** Driver-heap high-water registry (VERDICT r13 item 7): every
  * budgeted driver-side materialization site (identity-merge dimension
  * collects, resolver local path) records the bytes it ACTUALLY
  * retained — computed from the collected rows' true counts/char sums,
  * not the pre-collect estimate — so the "bounded driver contract" is
  * a measured number in the bench artifact, not a design claim. Bench
  * emits the per-site maxima as `heap_watermarks` and the JVM heap
  * pool peaks per pass; scripts/sf1_report.py asserts each site under
  * [[graft.state.IdentityResolver.LocalHeapBudget]] on the 10× probe.
  */
object HeapWatermark {
  private val peaks =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def record(site: String, bytes: Long): Unit =
    { peaks.merge(site, bytes, (a, b) => math.max(a, b)); () }

  def reset(): Unit = peaks.clear()

  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    peaks.asScala.map { case (k, v) => k -> v.longValue() }.toMap
  }

  /** Max committed-use peak across the JVM's heap memory pools since
    * the last [[resetJvmPeaks]] — the whole-process watermark (in
    * local mode this includes execution memory, so it bounds the run,
    * while the per-site records above isolate the driver collects).
    */
  def jvmHeapPeakBytes: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L))
      .foldLeft(0L)(_ + _)
  }

  def resetJvmPeaks(): Unit = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .foreach(_.resetPeakUsage())
  }
}
