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

  /** Measured retained size of a collected driver-side value tree —
    * true string/array/map contents, not a pre-collect estimate
    * (object-header constants are approximations; contents are exact).
    */
  def sizeOf(v: Any): Long = v match {
    case null => 4L
    case s: String => 40L + 2L * s.length
    case b: Array[Byte] => 16L + b.length
    case a: Array[_] => 16L + a.foldLeft(0L)(_ + sizeOf(_))
    case seq: scala.collection.Seq[_] => 16L + seq.foldLeft(0L)(_ + sizeOf(_))
    case m: scala.collection.Map[_, _] =>
      16L + m.foldLeft(0L) { case (acc, (k, x)) => acc + sizeOf(k) + sizeOf(x) }
    case r: org.apache.spark.sql.Row => 16L + r.toSeq.foldLeft(0L)(_ + sizeOf(_))
    case o: Option[_] => 16L + o.foldLeft(0L)(_ + sizeOf(_))
    case p: Product => 16L + p.productIterator.foldLeft(0L)(_ + sizeOf(_))
    case _: java.lang.Integer | _: java.lang.Float => 4L
    case _: java.lang.Boolean | _: java.lang.Byte => 1L
    case t: java.sql.Timestamp => { val _ = t; 12L }
    case _ => 8L // long / double / other fixed-width scalars
  }

  /** Meter rows a site already collected under its own bound (point
    * reads, require-gated harness collects, Iceberg metadata reads):
    * records the MEASURED retained bytes and returns the rows unchanged
    * — wrap-in-place, `recordRows(site, df.collect())`.
    */
  def recordRows[T](site: String, rows: Array[T]): Array[T] = {
    record(site, rows.foldLeft(0L)(_ + sizeOf(_)))
    rows
  }

  /** Budget-bounded, measured driver collect (VERDICT r15 item 5): the
    * collect runs through `limit(budget/bytesPerRow + 1)`, so the
    * driver NEVER retains more than the budget plus one row — an
    * over-budget result fails loudly here instead of pressuring the
    * heap — and the retained bytes are recorded under `site` from the
    * rows actually collected. `bytesPerRow` sizes the cap; prefer
    * overestimates. One job, no separate count probe.
    */
  def collectMetered(site: String, df: org.apache.spark.sql.DataFrame,
      bytesPerRow: Long,
      budget: Long = graft.state.IdentityResolver.LocalHeapBudget)
    : Array[org.apache.spark.sql.Row] = {
    val maxRows = math.min(Int.MaxValue - 2L, budget / math.max(1L, bytesPerRow))
    val rows = df.limit(maxRows.toInt + 1).collect()
    require(rows.length <= maxRows,
      s"$site: driver collect exceeds its budget (>${maxRows} rows at " +
        s"~$bytesPerRow B/row against ${budget >> 20} MiB) — this " +
        "materialization must become distributed at this scale")
    recordRows(site, rows)
  }

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
