package graft.operators

import graft.Tables
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark-headline analytics: classic scan-agg and join shapes plus
  * the event-stream batch analytics (tumbling windows, sessionization)
  * that mirror the reference's periodically-scheduled recompute jobs
  * (/root/reference/web/service.py APScheduler).
  */
object Analytics {

  /** TPC-H Q1-shaped multi-aggregate scan: the partial-agg + whole-stage
    * codegen showcase. One shuffle on the (tiny-cardinality) group key.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped join: customer(filtered, broadcast) ⋈ orders ⋈
    * lineitem, revenue per order, global top-k via
    * TakeOrderedAndProject (per-partition top-k + driver merge).
    */
  def q3Join(spark: SparkSession, sfDir: String, segment: String = "BUILDING", topN: Int = 10): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(round(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(topN)
  }

  /** TPC-H Q5-shaped multi-join: revenue per nation for one region —
    * the dim chain region→nation→customer broadcasts stage by stage,
    * the fact join shuffles once on orderkey, aggregate shrinks to
    * |nations| before the final sort.
    */
  def q5Nation(spark: SparkSession, sfDir: String, region: String = "ASIA"): DataFrame = {
    val r = Tables.region(spark, sfDir).filter(col("r_name") === region)
    val n = Tables.nation(spark, sfDir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, sfDir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** ROLLUP aggregate (grouping-sets family): per-(flag, status),
    * per-flag subtotals, and the grand total in one pass.
    */
  def q1Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))

  /** 7-day moving average of daily order revenue — a frame-based
    * window (rowsBetween) over one date-keyed aggregate. The
    * unpartitioned window is safe at any SF: its input is the daily
    * aggregate (|distinct dates| rows), not the fact table.
    */
  def movingAvg(spark: SparkSession, sfDir: String, days: Int = 7): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(dsum(col("o_totalprice")).as("daily_total"))
    val w = Window.orderBy(col("order_date"))
      .rowsBetween(-(days - 1), Window.currentRow)
    daily.withColumn("ma", round(avg(col("daily_total")).over(w), 4))
      .select(col("order_date").cast("string").as("order_date"), col("daily_total"), col("ma"))
  }

  /** Declared schema of the events.props JSON document — the contract
    * a 100 TB pipeline should state once, not re-discover per
    * attribute at parse time.
    */
  private val propsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))

  /** Semi-structured column handling: parse events.props ONCE with an
    * explicit schema (`from_json` → a single JsonToStructs in the
    * plan, typed fields out — PlanShapeSpec pins it), then bucket and
    * aggregate. The per-attribute `get_json_object` alternative
    * re-parses the document for every attribute extracted — invisible
    * at sf0.1, a real multiplier on 100 TB of events the moment the
    * schema grows past one field — and hands back strings to re-cast
    * besides.
    */
  def eventsProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(from_json(col("props"), propsSchema).as("p"), col("value"))
      .select((col("p.k") % 10).as("k_bucket"), col("value"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Sketch aggregates: HyperLogLog++ distinct counts and t-digest-ish
    * approximate quantiles per event type — the constant-memory
    * answers that replace exact distinct/sort at 100 TB. Estimates are
    * engine-specific (Spark HLL++ vs DuckDB's HLL differ by design) →
    * rows-only; the spec bounds them against exact values instead.
    */
  def approxStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n_events"),
        round(percentile_approx(col("value"), lit(0.5), lit(10000)), 2).as("p50_value"),
        round(percentile_approx(col("value"), lit(0.99), lit(10000)), 2).as("p99_value"))

  /** AS-OF enrichment via the custom [[graft.plans.AsOfJoin]] operator:
    * each event picks up the user's most recent basket state (count +
    * max rating of the interactions sharing that order date) as of the
    * event time. The right side is unique per (user, ts) so the as-of
    * pick is deterministic on both engines (DuckDB native ASOF JOIN is
    * the oracle).
    */
  def asofEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val basket = Tables.interactions(spark, sfDir)
      .groupBy(col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      .agg(count(lit(1)).as("n_items"), max(col("rating")).as("max_rating"))
    graft.plans.AsOf.join(spark, e, basket,
        keys = Seq("user_id" -> "b_user_id"), leftTimeCol = "ts", rightTimeCol = "b_ts")
      .select(
        col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("n_items").as("last_n_items"),
        col("max_rating").as("last_max_rating"),
        unix_millis(col("b_ts").cast("timestamp")).as("asof_ts_ms"))
  }

  /** Tumbling 1-hour window aggregate per event type — the batch twin
    * of the streaming pipeline in graft.streaming.EventStream. Window
    * start surfaced as epoch millis for oracle parity.
    */
  def eventsWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .select(
        unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Interval (range) join WITHOUT an equi key — "which events from
    * OTHER users fell inside each session's time window". The naive
    * plan for a pure range predicate is a nested-loop cross product
    * (|intervals| × |events| comparisons — unrunnable at scale); the
    * classic fix, used here, is BINNING: intervals explode to the
    * hour buckets they overlap (sessions are minutes long → 1-2 rows
    * each), events map to exactly one bucket, and the join becomes an
    * EQUI join on the bucket plus an exact containment filter.
    * Candidate pairs shrink from |e|·|i| to Σ_bucket e_b·i_b, and the
    * shuffle is hash-partitioned on time — embarrassingly parallel.
    * Because an event lives in exactly one bucket, no dedup is needed.
    * Tuning: bin ≈ median interval length; a hot bucket (traffic
    * spike) is a skew key — salt it or let AQE split (Skew.scaladoc).
    * This is composition order (a) of the custom-operator ladder: the
    * built-in equi-join machinery expresses it once binned, no custom
    * exec needed (contrast [[graft.plans.AsOfJoin]], which isn't
    * expressible this way).
    */
  def intervalJoin(spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
                   binMinutes: Int = 60): DataFrame = {
    val binMs = binMinutes * 60L * 1000L
    val intervals = sessionize(spark, sfDir, gapMinutes)
      .select(col("user_id"), col("session_id"),
        col("session_start_ms"), col("session_end_ms"))
      .withColumn("bucket", explode(sequence(
        expr(s"session_start_ms div $binMs"), expr(s"session_end_ms div $binMs"))))
    val events = Tables.events(spark, sfDir)
      .select(col("user_id").as("e_user"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("bucket", expr(s"ts_ms div $binMs"))
    intervals.join(events, Seq("bucket"))
      .filter(col("ts_ms") >= col("session_start_ms") &&
        col("ts_ms") <= col("session_end_ms") &&
        col("e_user") =!= col("user_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_concurrent"))
  }

  /** Sessionization with a 30-minute inactivity gap: lag + cumulative
    * session-break sum per user — two window passes over one shuffle by
    * user_id, then a per-(user, session) aggregate. The canonical
    * clickstream operator the reference's scheduler-driven stats jobs
    * would need at scale.
    */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = gapMinutes * 60L * 1000L
    Tables.events(spark, sfDir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_break")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("session_start_ms"),
        unix_millis(max(col("ts"))).as("session_end_ms"),
        dsum(col("value")).as("sum_value"))
  }
}
