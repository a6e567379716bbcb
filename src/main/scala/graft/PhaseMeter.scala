package graft

/** Per-query phase accumulator for the bench's stream decomposition
  * (VERDICT r13 item 5): the driver-checked streaming queries spend a
  * machinery floor (~seconds) on MemoryStream transport, checkpoint
  * dirs and sink setup that at production scale amortizes over a
  * long-running stream — a real micro-batch PLAN regression could hide
  * inside it. The harness drive loops wrap their actual micro-batch
  * execution (`processAllAvailable` / `processBatch`) in
  * [[PhaseMeter.time]]("data"); Bench resets the meter per query and
  * reports wall and data seconds separately, and the budget gate for
  * metered queries arms on DATA time.
  *
  * Thread-safe; zero overhead off the bench path (two nanoTime reads
  * per micro-batch).
  */
object PhaseMeter {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def time[A](phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(phase, (System.nanoTime() - t0) / 1e9,
      (a, b) => a + b)
  }

  def reset(): Unit = acc.clear()

  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap
  }
}
