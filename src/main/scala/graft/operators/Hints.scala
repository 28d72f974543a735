package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated join hints for the incremental (IVM) tick paths.
  *
  * The delta-merge joins in [[Dedup.exactDelta]] / [[ItemCF.coocDelta]]
  * want the delta side broadcast — for a batch-sized tick that is the
  * plan that never shuffles the store. But a HARDCODED `broadcast()`
  * hint is a runtime failure mode: a tick that outgrows the broadcast
  * limit (8 GB hard cap, far less in practice) kills the job instead of
  * degrading to a shuffle join. So the hint is conditional on a
  * MEASURED row count: the delta frames are already cached by the
  * operator convention (intermediates consumed more than once are
  * cached), so one `count()` against the cache is cheap, and the
  * decision is made from the tick's actual size, never a guess.
  * Above the cap the frame is returned unhinted and the optimizer
  * (static estimates + AQE) picks the join strategy — a big tick
  * becomes a shuffle join, not an OOM.
  */
object Hints {

  /** Default row cap for a delta-side broadcast. ~4M packed-long keys
    * ≈ 64 MiB on the wire — comfortably broadcastable on any sanely
    * sized executor, two orders of magnitude under the hard limit.
    * Ticks larger than this are no longer "batch-sized" and must
    * shuffle.
    */
  val DeltaBroadcastMaxRows: Long = 4L * 1000 * 1000

  /** `broadcast(df)` iff `df` has at most `maxRows` rows, else `df`
    * unhinted. `df` MUST already be cached (or trivially cheap): the
    * gate runs `count()` eagerly.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = DeltaBroadcastMaxRows): DataFrame =
    if (df.count() <= maxRows) broadcast(df) else df
}
