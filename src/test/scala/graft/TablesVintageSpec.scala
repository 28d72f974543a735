package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Generalizes the r7 events.ts lesson to EVERY loaded table: the
  * driver regenerates the testdata parquet between rounds and physical
  * encodings drift, so each loader must cast known-safe re-encodings
  * to the canonical logical schema and fail loudly on anything else —
  * at the loader, with the observed type, not five operators later
  * inside an analyzer error. One drifted fixture per table family:
  * orders (DATE for the canonical NTZ), lineitem (ZONED for NTZ +
  * int32 key widths), documents (int32 for int64), embeddings
  * (array&lt;double&gt; for array&lt;float&gt;).
  */
class TablesVintageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("graft-tvintage").toString

  test("orders: a DATE-encoded o_orderdate vintage normalizes to the canonical NTZ") {
    val dir = fixtureDir()
    Seq((1L, 10L, "O", 100.5, "1995-03-15", "1-URGENT"),
        (2L, 11L, "F", 220.0, "1996-07-01", "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast(DateType)).drop("d")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val read = Tables.orders(spark, dir)
    assert(read.schema("o_orderdate").dataType === TimestampNTZType)
    val days = read.select(date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .as[String].collect().sorted
    assert(days === Array("1995-03-15", "1996-07-01"))
  }

  test("lineitem: zoned l_shipdate and int32 key widths normalize to canonical types") {
    val dir = fixtureDir()
    Seq((1, 5, 3, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", "2020-01-02 03:04:05"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "s")
      .withColumn("l_shipdate", col("s").cast(TimestampType)).drop("s")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val read = Tables.lineitem(spark, dir)
    assert(read.schema("l_shipdate").dataType === TimestampNTZType)
    assert(read.schema("l_orderkey").dataType === LongType)
    assert(read.schema("l_partkey").dataType === LongType)
    assert(read.select(col("l_shipdate").cast("string")).as[String].head()
      === "2020-01-02 03:04:05")
  }

  test("documents: an int32 n_chars vintage widens to int64") {
    val dir = fixtureDir()
    Seq((1L, "hello world", "en", "web", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val read = Tables.documents(spark, dir)
    assert(read.schema("n_chars").dataType === LongType)
    assert(read.select(col("n_chars")).as[Long].head() === 11L)
  }

  test("embeddings: an array<double> vintage narrows to the canonical array<float>") {
    val dir = fixtureDir()
    Seq((1L, Seq(0.25, -1.5, 3.0), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val read = Tables.embeddings(spark, dir)
    assert(read.schema("embedding").dataType.asInstanceOf[ArrayType].elementType === FloatType)
    assert(read.select(col("embedding")).as[Seq[Float]].head() === Seq(0.25f, -1.5f, 3.0f))
  }

  test("zero drift leaves the frame untouched (no projection over the scan)") {
    val sf = TestSpark.sf
    val plan = Tables.lineitem(spark, sf).queryExecution.logical.toString
    assert(!plan.contains("Project"), s"vintage guard inserted a projection on clean data:\n$plan")
  }

  test("an unknown encoding fails loudly at the loader with table.column and type") {
    val dir = fixtureDir()
    Seq((1L, "not-a-number"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", lit("eleven"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents.n_chars"))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("a missing expected column fails loudly at the loader") {
    val dir = fixtureDir()
    Seq((1L, "text only")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("missing expected column"))
  }
}
