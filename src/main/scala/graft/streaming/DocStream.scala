package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typed document row for streaming corpus ingestion. */
case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Streaming twin of [[graft.operators.Dedup.exact]]: continuous
  * content dedup for a document ingest pipeline. A 100 TB corpus is
  * not assembled in one batch — it arrives as a stream, and admitting
  * a document twice poisons the training mix, so the dedup has to run
  * AT ingest.
  */
object DocStream {

  /** Keep the first arrival of each distinct content hash.
    * `dropDuplicatesWithinWatermark` holds one state entry per
    * DISTINCT content seen within the watermark horizon and expires
    * it afterwards — state is bounded by the ingest rate × horizon,
    * not by corpus lifetime, which is what keeps this runnable
    * forever. The trade is explicit: a duplicate re-arriving after
    * the horizon is re-admitted; the periodic batch
    * [[graft.operators.Dedup.exact]] pass over the landed corpus
    * catches those stragglers.
    */
  def dedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_md5", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
}
