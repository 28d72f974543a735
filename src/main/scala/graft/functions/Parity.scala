package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine float-parity aggregate helpers.
  *
  * A plain `sum(double)` is partition-order dependent (IEEE addition is
  * not associative), so the same query can hash-differently between
  * Spark and the DuckDB oracle. For columns whose values are exact at a
  * known decimal scale (prices, discounts, event values in the
  * testdata), summing after a decimal cast makes the aggregate exact
  * and therefore engine- and partition-order-independent; the final
  * double cast of the exact decimal is deterministic on both engines.
  *
  * DuckDB-side equivalents are in [[ParitySql]]-style fragments inlined
  * in SparkEntry.oracleSql.
  */
object Parity {

  /** Exact sum of a column whose values are exact at `scale` decimals. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Exact sum of a derived product (e.g. price*(1-disc)) rounded into
    * `scale` decimals before summation — both engines round the same
    * IEEE double to the same decimal, so the sum is exact and equal.
    */
  def dsumExpr(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Deterministic average: exact decimal sum, double division by
    * count, rounded to 4 decimals. Identical op sequence in DuckDB:
    * round(CAST(sum(CAST(x AS DECIMAL(30,s))) AS DOUBLE) / count(*), 4)
    */
  def davg(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(s"decimal(30,$scale)")).cast("double") / count(lit(1)), 4)
}
