package graft

/** Per-phase wall timings for the store-lifecycle queries.
  *
  * A `*_store` rung's bench number is seed + tick + read-back folded
  * into one wall — which hides regressions in the TICK path, the only
  * number that matters at 100 TB (the seed is a one-off; the tick is
  * the steady state, and r10's bench showed the seed dominating every
  * lifecycle query's wall). Store rungs wrap their EAGER phases
  * (artifact training, store seed, tick apply) in [[timed]] under
  * their registered query key; [[Bench]] resets before each rep,
  * snapshots after, and emits the map as `"phases"` in the JSON line,
  * so a tick-path regression is visible round-over-round instead of
  * drowned in seed noise. The residual (query wall − Σ phases) is the
  * lazy read/search the noop sink drives.
  *
  * Zero-cost when nothing reads it; ConcurrentHashMap because
  * maintainer ticks may record from stream threads.
  */
object PhaseTimer {
  private val timings =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap[String, Double]]()

  /** Time `body` and accumulate under (query, phase) — accumulate,
    * not overwrite, so a multi-tick rung reports the SUM of its
    * ticks.
    */
  def timed[T](query: String, phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      timings
        .computeIfAbsent(query,
          _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
        .merge(phase, dt, (a, b) => a + b)
      ()
    }
  }

  /** Record an externally-measured duration under (query, phase) —
    * accumulating like [[timed]]. For attribution splits measured by
    * task-side accumulators (e.g. the video decode's demux vs JPEG
    * CPU-seconds), where the wall is already covered by an enclosing
    * [[timed]] and the split rides along as extra phases.
    */
  def record(query: String, phase: String, seconds: Double): Unit = {
    timings
      .computeIfAbsent(query,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
      .merge(phase, seconds, (a, b) => a + b)
    ()
  }

  def snapshot(): Map[String, Map[String, Double]] = {
    import scala.jdk.CollectionConverters._
    timings.asScala.map { case (q, m) => q -> m.asScala.toMap }.toMap
  }

  def reset(): Unit = timings.clear()
}
