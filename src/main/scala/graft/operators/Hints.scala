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
  *
  * The cap is defined in BYTES and divided by the caller's estimated
  * row width, so "small enough to broadcast" means one thing across
  * key shapes: a 4M-row packed-long tick and an ~800k-row md5-keyed
  * tick both sit at the same ~64 MiB on the wire.
  */
object Hints {

  /** Byte budget for a delta-side broadcast: ~64 MiB serialized —
    * comfortably broadcastable on any sanely sized executor, two
    * orders of magnitude under the 8 GB hard limit.
    */
  val DeltaBroadcastMaxBytes: Long = 64L * 1024 * 1024

  /** Row cap for an estimated serialized row width. */
  def maxRowsFor(estRowBytes: Long): Long = DeltaBroadcastMaxBytes / estRowBytes

  /** Row cap for packed-long-keyed tick frames (8-byte key + count +
    * row overhead ≈ 16 B): ~4M rows ≈ the byte budget.
    */
  val DeltaBroadcastMaxRows: Long = maxRowsFor(16)

  /** Row cap for md5-keyed tick frames (32-char string key + small
    * payload + offsets ≈ 88 B serialized): the SAME byte budget the
    * packed-long cap encodes, ~5.5× fewer rows.
    */
  val DeltaBroadcastMaxRowsMd5: Long = maxRowsFor(88)

  /** `broadcast(df)` iff `df` has at most `maxRows` rows, else `df`
    * unhinted. `df` MUST already be cached (or trivially cheap): the
    * gate runs `count()` eagerly.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = DeltaBroadcastMaxRows): DataFrame =
    if (df.count() <= maxRows) broadcast(df) else df
}
