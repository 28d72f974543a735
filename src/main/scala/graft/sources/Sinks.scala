package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side layout operators — the at-scale counterparts of the
  * reference's two sinks (PostgreSQL tables in prepare_dataset.py:170,
  * redis top-N/stat keys in estimator.persist / statistics.py:39).
  *
  * On a lake the same roles are played by partitioned parquet (predicate
  * pruning on read), bucketed tables (pre-shuffled join layout), and a
  * key-value export in exactly the reference's redis format.
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per partition value,
    * so readers filtering on the partition column prune entire files.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table: pre-shuffled on the join key at write time. Two
    * tables bucketed the same way join with ZERO exchanges — the
    * layout that makes the 100 TB interactions⋈dim join shuffle-free.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each. Streaming/CDC sinks (e.g.
    * [[graft.streaming.EventStream.startCdcApply]]) emit one file per
    * micro-batch partition; after a day that is thousands of KB-sized
    * files, and every subsequent scan pays a per-file open + footer
    * read. Compaction is the standing maintenance job every lake runs
    * (Delta OPTIMIZE / Iceberg rewrite_data_files — here the plain-
    * parquet equivalent).
    *
    * The target file count comes from the directory's actual on-disk
    * bytes (compressed), not a row-count guess. The rewrite stages to
    * a sibling dir then swaps, so a concurrent reader never sees a
    * half-written directory; crash mid-swap leaves `_staged` intact
    * for recovery — same protocol as the CDC snapshot writer.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): Unit = {
    // size from the directory's actual (compressed) bytes, via the
    // path's own Hadoop FileSystem — works on local disk, HDFS, and
    // object-store connectors alike
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(live)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(onDisk.toDouble / targetBytes).toInt)
    val staged = new org.apache.hadoop.fs.Path(path + "_staged")
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    // a failed rename must THROW (ignoring it could delete the sole
    // surviving copy); a crash between the two moves leaves _old or
    // _staged intact for manual recovery, never zero copies
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    fs.delete(old, true)
    require(fs.rename(live, old), s"failed to move $live aside")
    require(fs.rename(staged, live), s"failed to promote $staged -> $live")
    fs.delete(old, true)
    ()
  }

  /** The reference's redis export shape (estimator.persist:81-99):
    * key `u<user_id>`, value `item;item;...` ordered by rank. Emitted
    * as a DataFrame so any KV-capable sink (redis connector, kafka,
    * csv) can consume it without reshaping.
    */
  def topNKeyValue(recs: DataFrame): DataFrame =
    recs
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("item_id")))).as("items"))
      .select(
        concat(lit("u"), col("user_id")).as("key"),
        concat_ws(";", expr("transform(items, x -> x.item_id)")).as("value"))

  /** statistics.py redis keys: `m<id>#counts` and `m<id>#avg` rows. */
  def statsKeyValue(stats: DataFrame): DataFrame = {
    val counts = stats.select(
      concat(lit("m"), col("item_id"), lit("#counts")).as("key"),
      col("count_users").cast("string").as("value"))
    val avgs = stats.select(
      concat(lit("m"), col("item_id"), lit("#avg")).as("key"),
      col("avg_rating").cast("string").as("value"))
    counts.unionAll(avgs)
  }
}
