package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSourceV2 connector: a deterministic, partition-parallel
  * synthetic ratings generator.
  *
  * The reference seeds its system by downloading MovieLens and bulk-
  * loading PostgreSQL (prepare_dataset.py); at engine-test scale the
  * equivalent is generating the interactions fact directly on the
  * executors — no storage round-trip, any size, reproducible. Each
  * input partition derives every row from (seed, global row index) via
  * a splitmix-style mixer, so the SAME options always produce the SAME
  * table regardless of parallelism.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.RatingsGenSource")
  *     .option("rows", 1000000).option("partitions", 32)
  *     .option("users", 10000).option("items", 2000)
  *     .option("seed", 42).load()
  * }}}
  */
class RatingsGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RatingsGenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RatingsGenTable(properties.asScala.toMap)
}

object RatingsGenSource {
  val schema: StructType = StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false),
    StructField("rating", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** splitmix64 — the standard seedable 64-bit mixer. */
  def mix(x0: Long): Long = {
    var x = x0 + -7046029254386353131L
    x = (x ^ (x >>> 30)) * -4658895280553007687L
    x = (x ^ (x >>> 27)) * -7723592293110705685L
    x ^ (x >>> 31)
  }
}

class RatingsGenTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_ratings_gen"
  override def schema(): StructType = RatingsGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RatingsGenScan(
      rows = options.getLong("rows", 1000L),
      partitions = options.getInt("partitions", 4),
      users = options.getLong("users", 1000L),
      items = options.getLong("items", 200L),
      seed = options.getLong("seed", 42L),
      // skewPct% of rows land on user_id 0 (hot-key skew for join
      // mitigation tests); the gate is its own hash draw so the other
      // columns keep their distributions
      skewPct = options.getInt("skewPct", 0))
}

class RatingsGenScan(rows: Long, partitions: Int, users: Long, items: Long, seed: Long,
                     skewPct: Int = 0)
  extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = RatingsGenSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0 until partitions).flatMap { p =>
      val start = p * per
      val n = math.min(per, rows - start)
      if (n > 0) Some(RatingsGenPartition(start, n, users, items, seed, skewPct): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = RatingsGenReaderFactory
}

case class RatingsGenPartition(start: Long, count: Long, users: Long, items: Long, seed: Long,
                               skewPct: Int = 0)
  extends InputPartition

object RatingsGenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RatingsGenPartition]
    new PartitionReader[InternalRow] {
      import RatingsGenSource.mix
      private var i = -1L
      private val row = new Array[Any](4)
      private val baseMicros = 1704067200000000L // 2024-01-01T00:00Z

      override def next(): Boolean = { i += 1; i < p.count }

      override def get(): InternalRow = {
        val g = p.start + i // global row index → parallelism-independent
        val h1 = mix(p.seed ^ g)
        val h2 = mix(h1)
        val h3 = mix(h2)
        val h4 = mix(h3)
        val hot = p.skewPct > 0 &&
          java.lang.Long.remainderUnsigned(mix(h4), 100L) < p.skewPct
        row(0) = java.lang.Long.valueOf(
          if (hot) 0L else java.lang.Long.remainderUnsigned(h1, p.users))
        row(1) = java.lang.Long.valueOf(java.lang.Long.remainderUnsigned(h2, p.items))
        // half-star rating in [0.5, 5.0]
        row(2) = java.lang.Double.valueOf(
          0.5 + 0.5 * java.lang.Long.remainderUnsigned(h3, 10L))
        // a timestamp within 2024
        row(3) = java.lang.Long.valueOf(
          baseMicros + java.lang.Long.remainderUnsigned(h4, 31622400000000L))
        InternalRow.fromSeq(row.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
