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
  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (rounds ≤ 7)
    * and plain TIMESTAMP(MICROS) (round 8 regeneration) — this reader
    * normalizes either layout to session-zoned TimestampType:
    *  - NANOS: Spark 4 rejects it outright (PARQUET_TYPE_ILLEGAL) unless
    *    spark.sql.legacy.parquet.nanosAsLong=true (set by our sessions),
    *    which lands it as LongType nanos → truncate to µs (integer div —
    *    never double division, ns since epoch exceeds 2^53) and restore
    *    TimestampType;
    *  - MICROS with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ →
    *    cast to TimestampType (sessions run UTC, so the instant is
    *    unchanged and DuckDB's read of the same file agrees).
    * Branching on the footer schema (not a config) keeps every operator
    * agnostic to which vintage of the fixture directory it gets. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(apply(s, d, "events"))

  /** Normalize any events-shaped frame's `ts` to session-zoned
    * TimestampType regardless of fixture vintage (see [[events]]) —
    * shared by the batch reader, the streaming replay source, and every
    * spec that re-writes fixture slices as streaming input. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
