package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first access path: registers the scale-factor tables (and the
  * interactions view) as temp views so users can drive the engine with
  * `spark.sql(...)` instead of the DataFrame API — both compile to the
  * same Catalyst plans. The reference exposes its data through
  * SQLAlchemy models; this is the equivalent declarative surface.
  */
object SqlApi {

  // events is absent here: its raw parquet is TIMESTAMP(NANOS), which
  // only the dedicated Tables.events loader can read — registered below
  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Idempotently register `<name>` views for one sfDir plus the
    * `interactions` ratings view.
    */
  def register(spark: SparkSession, sfDir: String): Unit = {
    tableNames.foreach { n =>
      Tables.table(spark, sfDir, n).createOrReplaceTempView(n)
    }
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.interactions(spark, sfDir).createOrReplaceTempView("interactions")
  }

  /** Run a SQL query against the registered views. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
