package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Parquet table readers for the driver-generated star schema
  * (TESTDATA.md:13-16). One file per table per scale factor; schema is
  * embedded in the parquet footer, so plain `spark.read.parquet` gives the
  * correct types (FIXTURES.md "Schemas"). At 100 TB these would be
  * partitioned directories; the reader API is path-shaped so swapping a
  * single file for a partitioned dataset is transparent to every operator.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per session → (dir, table): spark.read.parquet re-reads the
  // footer for schema on every call, and a ~100-query harness calls these
  // readers a few hundred times. The fixture files are immutable, and a
  // DataFrame is just a reusable logical plan — caching it is safe and
  // shaves the repeated schema-inference latency.
  //
  // Eviction: a cached DataFrame strongly references its SparkSession, so
  // weak keys alone can never collect an entry (the value pins the key).
  // Instead, stopped sessions are purged eagerly on every access — a
  // stop/getOrCreate-cycling process frees each dead session's plans on
  // its next read, with no arbitrary size threshold. Entries are bounded
  // at (live sessions × dirs × 10 tables).
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    cache
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
      .computeIfAbsent((sfDir, name),
        _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). Sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true so the column arrives as
    * LongType nanos; this reader truncates to µs (integer div — never
    * double division, ns since epoch exceeds 2^53) and restores
    * TimestampType, matching DuckDB's µs TIMESTAMP read of the same file
    * (SURVEY.md §1.2 µs-or-coarser rule). */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
