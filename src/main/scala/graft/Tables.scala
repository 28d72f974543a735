package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders over a scale-factor directory, plus the
  * `interactions` view that maps the driver's TPC-H-ish testdata onto
  * the reference's user/item/rating model (see SURVEY.md §1; reference
  * data model at /root/reference/web/app/models.py:6-77).
  *
  * Every loader returns a lazy DataFrame — filters/projections applied
  * downstream are pushed into the parquet scan by Catalyst, so callers
  * never pay for columns they don't read.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // TIMESTAMP(NANOS) parquet is unreadable without this legacy mode;
    // set before the read so an ns-vintage file surfaces as long for
    // the guard below instead of failing the scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    canonicalSchemas.get(name).map(normalizeSchema(raw, name, _)).getOrElse(raw)
  }

  /** Canonical LOGICAL schema per testdata table — what every operator
    * downstream is written against. The driver regenerates the parquet
    * between rounds and physical encodings have drifted across
    * vintages (r7: events.ts went TIMESTAMP(NANOS) → TIMESTAMP_NTZ and
    * six green queries crashed at analysis time), so [[table]] runs
    * every load through [[normalizeSchema]]: known-safe re-encodings
    * cast to the canonical type, anything else fails LOUDLY at the
    * loader with the observed type. A 100 TB lake is never one
    * vintage; the engine owns coercion (the reference leaves it to
    * Postgres, models.py:6-77).
    */
  private[graft] val canonicalSchemas: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // canonical = NTZ for the date-ish columns: that IS the current
      // physical vintage, so the common path stays projection-free and
      // date filters keep reaching the parquet scan; zoned/DATE/ns
      // vintages cast TO it (UTC sessions make it value-identical).
      // events.ts stays canonically ZONED — the r7 seam and its specs.
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Assert-and-normalize every expected column to its canonical type.
    * Zero drift → the input frame unchanged (no projection inserted, so
    * pinned plans and pushdowns are untouched on the common path).
    * Extra columns pass through; a MISSING expected column throws.
    */
  private[graft] def normalizeSchema(raw: DataFrame, tableName: String,
      expected: Seq[(String, DataType)]): DataFrame = {
    val replacements = expected.flatMap { case (name, canonical) =>
      val field = raw.schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$tableName is missing expected column $name " +
            s"(found: ${raw.columns.mkString(", ")})"))
      normalizeColumn(tableName, name, field.dataType, canonical).map(name -> _)
    }
    replacements.foldLeft(raw) { case (df, (name, c)) => df.withColumn(name, c) }
  }

  private def isIntegral(t: DataType): Boolean =
    t == ByteType || t == ShortType || t == IntegerType || t == LongType

  /** The known-safe drift matrix — `None` = already canonical. Each
    * admitted case is a physical RE-ENCODING of the same logical
    * value, met or plausible across testdata vintages:
    * ns-as-long/NTZ/DATE → zoned TIMESTAMP (the r7 burn, UTC sessions
    * make the reinterpretation value-identical); integral width moves
    * (the generated key spaces fit every width the driver has used,
    * and the DuckDB-side canon collapses int widths the same way);
    * integral/float/decimal → DOUBLE; array&lt;double&gt; →
    * array&lt;float&gt; (the embedding column's storage precision).
    * Everything else throws with the observed type — a NEW vintage
    * should fail here, once, loudly.
    */
  private def normalizeColumn(table: String, name: String,
      actual: DataType, canonical: DataType): Option[Column] = (actual, canonical) match {
    case (a, c) if a == c => None
    // timestamp family: ns-since-epoch long (nanosAsLong surfaces
    // TIMESTAMP(NANOS) this way; integer div — double div loses
    // precision above 2^53 ns), zone-less µs, plain DATE
    case (LongType, TimestampType) => Some(timestamp_micros(expr(s"$name div 1000")))
    case (TimestampNTZType, TimestampType) => Some(col(name).cast(TimestampType))
    case (DateType, TimestampType) => Some(col(name).cast(TimestampType))
    case (LongType, TimestampNTZType) =>
      Some(timestamp_micros(expr(s"$name div 1000")).cast(TimestampNTZType))
    case (TimestampType, TimestampNTZType) => Some(col(name).cast(TimestampNTZType))
    case (DateType, TimestampNTZType) => Some(col(name).cast(TimestampNTZType))
    case (a, c) if isIntegral(a) && isIntegral(c) => Some(col(name).cast(c))
    case (a, DoubleType) if isIntegral(a) || a == FloatType ||
      a.isInstanceOf[DecimalType] => Some(col(name).cast(DoubleType))
    case (ArrayType(DoubleType, n), ArrayType(FloatType, _)) =>
      Some(col(name).cast(ArrayType(FloatType, n)))
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => None // containsNull variance
    case (a, c) => throw new IllegalArgumentException(
      s"$table.$name has unsupported type $a; expected $c " +
        "or a known-safe re-encoding of it (see Tables.normalizeColumn)")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table with `ts` normalized to ONE canonical type
    * (session-zoned TIMESTAMP), whatever parquet vintage wrote it.
    *
    * A 100 TB lake always carries mixed-vintage files; this loader has
    * now met three encodings of the SAME logical column across test
    * rounds — TIMESTAMP(NANOS) (readable only as a long via the
    * nanosAsLong legacy mode), TIMESTAMP_NTZ (µs, no zone), and zoned
    * TIMESTAMP — and r7 proved that normalizing only one of them lets a
    * re-vintaged file crash every downstream `unix_millis(ts)` at
    * analysis time. So: ns-long → µs via integer division (double
    * division loses precision above 2⁵³ ns); NTZ → cast to TimestampType
    * (every graft entrypoint pins session tz UTC, so the wall-clock
    * reinterpretation is value-identical and DuckDB epoch-millis parity
    * holds); zoned passes through; anything else fails LOUDLY here with
    * the observed type, not five operators later inside an analyzer
    * error. (Reference contrast: models.py:6-77 declares DateTime once
    * and Postgres owns coercion — on a lake, the engine must own it.)
    */
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")

  /** Vintage normalization seam for any events-shaped frame — the
    * original (r7) instance of what [[normalizeSchema]] now does for
    * every table; kept as the spec-facing seam for ts-only fixtures.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    normalizeSchema(raw, "events", Seq("ts" -> TimestampType))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Half-star rating scale used by the reference (surprise
    * Reader(rating_scale=(0.5, 5.0)), prototype/trainer.py:37) mapped
    * from l_quantity (1..50): clamp(round(q/5), 0.5, 5.0) in half-star
    * steps. Pure column expression → stays inside whole-stage codegen.
    */
  def halfStarRating(qty: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    least(lit(5.0), greatest(lit(0.5), round(qty / 5.0 * 2.0) / 2.0))

  /** The user-item interactions fact: orders ⋈ lineitem on orderkey,
    * upserted to one row per (user_id, item_id).
    *
    * Mirrors the reference's `recommendation_ratings` table
    * (models.py:6-15, PRIMARY KEY (user_id, movie_id)) and its
    * `session.merge` upsert semantics (controller.py:124): a re-rate
    * replaces, never duplicates — latest ts wins, deterministic
    * tie-breaks. At cluster scale both fact tables would be bucketed
    * by orderkey, making the join shuffle-free; the upsert window is
    * one shuffle on the (user, item) key.
    */
  def interactions(spark: SparkSession, sfDir: String): DataFrame =
    interactionsFrom(
      orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_orderdate"),
      lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag"))

  /** [[interactions]] over injectable base tables — the seam that lets
    * the SAME registered build run against a bucketed layout: feed it
    * `spark.table(...)` reads of orders/lineitem bucketed on their
    * orderkeys ([[graft.sources.Sinks.writeBucketed]]) and the join
    * plans with zero exchanges (PlanShapeSpec pins it) — the 100 TB
    * layout claim from SURVEY §4, proven on the real operator rather
    * than a toy join.
    */
  def interactionsFrom(o: DataFrame, l: DataFrame): DataFrame = {
    val raw = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        o("o_custkey").as("user_id"),
        l("l_partkey").as("item_id"),
        halfStarRating(l("l_quantity")).as("rating"),
        (l("l_returnflag") === lit("R")).as("is_implicit"),
        o("o_orderdate").as("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("item_id"))
      .orderBy(col("ts").desc, col("rating").desc, col("is_implicit").asc)
    raw.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Degree-capped CF working set: keep at most `cap` interactions per
    * `key` (top by rating desc, ts desc, tie-broken by `tieId` asc —
    * a total order because `tieId` is unique within `key` after the
    * upsert dedup). This bounds the pair self-joins in
    * [[graft.operators.ItemCF]] to O(Σ min(deg,cap)²): without it one
    * power user with 10⁵ interactions alone emits 10¹⁰ pairs at 100 TB.
    * The cap (default 128) exceeds the max degree at every test SF
    * (90 at sf0.01, 105 at sf0.1), so small-SF results are unchanged —
    * but the SQL oracles express the same cap, so correctness stays
    * checkable even where it prunes.
    */
  def capDegree(df: DataFrame, key: String, tieId: String, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col("rating").desc, col("ts").desc, col(tieId).asc)
    df.withColumn("deg_rn", row_number().over(w))
      .filter(col("deg_rn") <= cap)
      .drop("deg_rn")
  }

  /** DuckDB-side SQL equivalent of [[interactions]], used as a CTE
    * prefix by the relational oracles. Column names must match the
    * Spark side exactly (driver compares by sorted column name).
    */
  val interactionsSql: String =
    """WITH interactions_raw AS (
      |  SELECT o.o_custkey AS user_id,
      |         l.l_partkey AS item_id,
      |         least(5.0, greatest(0.5, round(l.l_quantity / 5.0 * 2.0) / 2.0)) AS rating,
      |         (l.l_returnflag = 'R') AS is_implicit,
      |         o.o_orderdate AS ts
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |),
      |interactions AS (
      |  SELECT user_id, item_id, rating, is_implicit, ts FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, item_id
      |      ORDER BY ts DESC, rating DESC, is_implicit ASC) AS rn
      |    FROM interactions_raw)
      |  WHERE rn = 1
      |)""".stripMargin

  /** SQL twin of [[capDegree]]: appends a `capped` CTE to
    * [[interactionsSql]] keeping ≤ `cap` rows per `key`, same total
    * order as the Spark side.
    */
  def cappedSql(key: String, tieId: String, cap: Int): String =
    s"""$interactionsSql, capped AS (
       |  SELECT user_id, item_id, rating, is_implicit, ts FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $key
       |      ORDER BY rating DESC, ts DESC, $tieId ASC) AS deg_rn
       |    FROM interactions) WHERE deg_rn <= $cap
       |)""".stripMargin
}
