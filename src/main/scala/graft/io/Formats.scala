package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det

/** Interchange-format sources (SURVEY.md §2.1 beyond parquet): CSV and
  * JSON write→read roundtrips proven by the ORACLE — each query writes a
  * fixture table out in the interchange format, reads it back with an
  * explicit schema, and aggregates; the DuckDB twin aggregates the
  * original parquet directly, so a hash match certifies byte-level
  * fidelity of the format path (quoting, escaping, JSON-in-JSON strings,
  * µs timestamps), not just "it didn't crash".
  *
  * Scale notes: the write is `mode(overwrite)` into a per-sfDir tmp
  * directory and splits into one file per input partition — the normal
  * distributed sink shape. The read passes the schema explicitly:
  * schema-on-read inference would scan the data twice and is the
  * first thing to die on a 100 TB feed. Timestamps round-trip at
  * MICROsecond precision via an explicit timestampFormat on both sides
  * (Spark's default writes millis and silently truncates). */
object Formats {

  // µs-precision wire format, both directions (default truncates to ms)
  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  // Per-JVM tag: two concurrent sessions running the same query over the
  // same (or hash-colliding) sfDir must not overwrite each other's
  // roundtrip fixtures mid-read (ADVICE round-3).
  private val sessionTag: String =
    java.util.UUID.randomUUID().toString.take(8)

  // Reversible, collision-free encoding of the source dir (hex of UTF-8):
  // distinct dirs can never collide the way hashCode could, and the path
  // component is always [0-9a-f] — no negative sign, no separators.
  private def tmpDir(kind: String, d: String): String = {
    val enc = d.getBytes("UTF-8").map(b => f"$b%02x").mkString
    s"${sys.props("java.io.tmpdir")}/graft_${sessionTag}_${kind}_$enc"
  }

  /** CSV roundtrip over orders: header + quoted strings (o_comment
    * carries commas), DATE-typed o_orderdate. Output = per-priority
    * pricing profile, hash-gated against parquet-side DuckDB. */
  def sourceCsv(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val dir = tmpDir("csv", d)
    orders.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(dir)
    s.read.schema(orders.schema)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("o_totalprice")), 2).as("sum_price"),
        max(col("o_orderdate")).as("max_date"))
      .orderBy(col("o_orderpriority"))
  }

  /** ORC roundtrip over lineitem — the third interchange format, columnar
    * like parquet (predicate pushdown and column pruning survive; the
    * SourcesSpec pins ORC pushdown separately). Aggregate profile gated
    * against parquet-side DuckDB like the CSV/JSON twins. */
  def sourceOrc(s: SparkSession, d: String): DataFrame = {
    val lineitem = Tables.lineitem(s, d)
    val dir = tmpDir("orc", d)
    lineitem.write.mode("overwrite").orc(dir)
    s.read.schema(lineitem.schema).orc(dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("l_quantity")), 2).as("sum_qty"),
        Det.round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Plain-text-lines roundtrip over documents — the rawest interchange
    * format an LLM corpus ships in (one record per line, tab-separated
    * header fields): write `doc_id \t lang \t text` lines with
    * `spark.write.text`, read them back with `spark.read.text`, split
    * on the FIRST two tabs only (document text keeps any further tabs),
    * and aggregate per language. The DuckDB twin aggregates the
    * original parquet, so a hash match certifies the line codec —
    * field order, tab escaping assumptions, newline integrity — not
    * just "it didn't crash". (Fixture text is word-salad with no tabs
    * or newlines; a corpus that had them would need the JSON/parquet
    * path, which is why this op aggregates byte lengths rather than
    * pretending lossless framing.)
    *
    * Scale: text read/write is splittable and schema-free (no
    * inference pass — the line IS the schema); one narrow map + one
    * bounded groupBy. */
  def sourceTextLines(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val dir = tmpDir("txt", d)
    docs.select(concat_ws("\t",
        col("doc_id").cast("string"), col("lang"), col("text")).as("value"))
      .write.mode("overwrite").text(dir)
    val lines = s.read.text(dir)
    lines
      .select(
        split(col("value"), "\t", 3).getItem(0).cast("bigint").as("doc_id"),
        split(col("value"), "\t", 3).getItem(1).as("lang"),
        split(col("value"), "\t", 3).getItem(2).as("text"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("lang"))
  }

  /** Partitioned parquet SINK + partition-pruned scan: events written
    * `partitionBy(event_type)` (the layout a 100 TB event log actually
    * uses — one directory per type, so a single-type consumer reads
    * 1/|types| of the bytes), read back with a type filter that must
    * prune at the DIRECTORY level (PartitionFilters, pinned separately in
    * CustomSurfaceSpec), then aggregated. Oracle aggregates the original
    * parquet under the same filter — a hash match certifies the
    * partition column round-trips through the directory encoding
    * (values become path segments and back). */
  def sinkPartitioned(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val dir = tmpDir("sinkpart", d)
    events.write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    s.read.parquet(dir)
      .where(col("event_type").isin("purchase", "signup"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("value")), 2).as("sum_value"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  /** Query key `sink_shard_manifest`: the corpus PUBLISHING step — the
    * documents table written as 16 hash shards (`partitionBy` on the
    * engine-portable Knuth bucket of doc_id, the reproducible shard
    * assignment a training loader relies on), read BACK from the files,
    * and summarized as the release MANIFEST: per shard the doc count,
    * whitespace-token total, and an order-insensitive exact CONTENT
    * digest (sum of each doc's md5-prefix-48-bits, reduced mod 2⁵³ —
    * the sum is carried in DECIMAL(38,0) here and HUGEINT in DuckDB, so
    * the reduction is exact and overflow-free on both engines at any
    * corpus size, and addition makes the digest independent of file/row
    * order, which parquet does not preserve). The shard bucket likewise
    * reduces doc_id mod 2³¹ BEFORE the Knuth multiply: 2³¹·2654435761
    * < 2⁶³, so a doc_id beyond ~3.5e9 can overflow neither engine (the
    * JVM would wrap to a negative shard where DuckDB raises).
    * The oracle computes the same manifest from the ORIGINAL
    * table, so a row lost, duplicated, or corrupted anywhere in the
    * write→read round trip breaks the hash gate — this is the artifact
    * a consumer checks before training on a published shard set.
    *
    * Scale: the write is one hash-partitioned pass; the manifest is one
    * 16-group aggregate. At 100 TB shards are directories and the
    * manifest is the same 16 rows. */
  def sinkShardManifest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("shard",
        expr("cast(((doc_id % 2147483648L) * 2654435761L) % 4294967296L % 16 as int)"))
    val dir = tmpDir("shardmanifest", d)
    docs.write.mode("overwrite").partitionBy("shard").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
        (sum(conv(substring(md5(col("text")), 1, 12), 16, 10)
          .cast("decimal(38,0)")) % lit(9007199254740992L))
          .cast("long").as("content_digest"))
      .orderBy(col("shard"))
  }

  /** Dynamic Partition Pruning — THE 100 TB star-join feature: the fact
    * written `partitionBy(event_date)`, joined to a small GENERATED date
    * dim (a calendar the fact's scan cannot see statically) carrying a
    * selective filter (day-of-month ≤ 5). At planning time the filter
    * only exists on the dim; DPP injects the dim's surviving keys as a
    * runtime subquery into the fact scan's PartitionFilters, so only the
    * matching date DIRECTORIES are read — on a 1000-executor cluster the
    * difference between scanning 5/31ths of the fact and all of it.
    * PlanSpec pins `dynamicpruning` on the fact scan; the oracle
    * aggregates the raw events under the equivalent date predicate (the
    * generated calendar covers every fact date, so join ≡ filter). */
  def joinDppPruned(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val dir = tmpDir("dpp", d)
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      events.withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val fact = s.read.parquet(dir)
    val dim = s.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("2024-01-01")),
        lit(java.sql.Date.valueOf("2024-12-31")),
        expr("interval 1 day"))).as("event_date"))
      .where(dayofmonth(col("event_date")) <= 5)
    fact.join(dim, Seq("event_date"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double") /
          lit(1e2)).as("sum_value"))
      // DATE cells render differently across the two parquet readers —
      // present as midnight timestamps (the comparator normalizes those)
      .select(col("event_date").cast("timestamp").as("event_date"),
        col("n"), col("sum_value"))
      .orderBy(col("event_date"))
  }

  /** Small-files COMPACTION — the most common 100 TB layout maintenance
    * job: a fragmented table (64 splinter files here — streaming sinks
    * and over-parallel writes produce exactly this) rewritten to a few
    * right-sized files. The compaction is a pure repartition+rewrite (no
    * data transformation), so the oracle gating the post-compaction
    * aggregate against the ORIGINAL parquet certifies the rewrite was
    * lossless; FormatsSpec pins the actual file counts (64 → 4). At
    * 100 TB the same job runs per-partition with a target-bytes-per-file
    * repartition count instead of a constant. */
  def layoutCompaction(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val fragDir = tmpDir("compact_frag", d)
    val outDir = tmpDir("compact_out", d)
    ev.repartition(64).write.mode("overwrite").parquet(fragDir)
    s.read.schema(ev.schema).parquet(fragDir)
      .repartition(4).write.mode("overwrite").parquet(outDir)
    s.read.schema(ev.schema).parquet(outDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("value")), 2).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  /** DYNAMIC partition overwrite — the incremental-restatement write
    * every partitioned warehouse needs: a full partitioned load, then a
    * correction batch for ONE partition (purchases, values doubled)
    * written with partitionOverwriteMode=dynamic, which must replace
    * exactly the partitions present in the batch and leave every other
    * directory untouched (static overwrite mode would truncate the whole
    * table — THE classic data-loss footgun this key certifies against).
    * The oracle recomputes the expected post-restatement state from the
    * original parquet. */
  def sinkPartitionOverwriteDynamic(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dir = tmpDir("dynpart", d)
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    ev.where(col("event_type") === "purchase")
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("value")), 2).as("sum_value"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  /** Schema EVOLUTION across file generations — every long-lived feed
    * grows columns: generation v1 (even order keys) lacks o_totalprice,
    * generation v2 (odd keys) carries it. A mergeSchema read must union
    * the schemas, null-fill the missing column for old files, and still
    * aggregate correctly — the oracle recomputes the expected state from
    * the original parquet with the same even/odd column availability.
    * (Schema-on-read UNION, not inference: both generations' schemas come
    * from their footers; at 100 TB mergeSchema cost is bounded by footer
    * count, or pinned by a user-supplied evolved schema.) */
  def sourceSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val dir = tmpDir("evolve", d)
    orders.where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    orders.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$dir/v2")
    s.read
      .option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(dir)
      .groupBy(year(col("o_orderdate")).cast("int").as("y"))
      .agg(
        count(lit(1)).as("n"),
        count(col("o_totalprice")).as("n_priced"),
        Det.round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2)
          .as("sum_price"))
      .orderBy(col("y"))
  }

  /** Kinesis-record envelope roundtrip — the reference's ingest shape
    * without the connector (zero-egress sandbox; KinesisStub documents the
    * swap-in point). Each event is wrapped exactly like a Kinesis record:
    * partition key (the stream sharding key — user_id, so per-user order
    * survives sharding), sequence number, and an opaque base64 data blob
    * holding the JSON-serialized event. The decode side — unbase64 →
    * from_json with the explicit envelope schema → aggregate — is the
    * transform a real Kinesis source feeds; hash-gating the aggregate
    * against raw parquet certifies blob serialization round-trips every
    * field (µs timestamps included; props is JSON-in-JSON-in-base64).
    * All of it is built-in column expressions (no UDFs; from_json is a
    * CodegenFallback, the rest codegen) — wrap and decode scale per-row
    * with no shuffle until the final aggregate. */
  private val jsonOpts = Map("timestampFormat" -> tsFmt)

  /** Wrap rows as Kinesis-shaped records (works on batch AND streaming
    * DataFrames — pure column expressions). */
  def kinesisWrap(df: DataFrame): DataFrame =
    df.select(
      col("user_id").cast("string").as("partition_key"),
      col("event_id").as("sequence_number"),
      base64(to_json(struct(df.columns.toIndexedSeq.map(col): _*), jsonOpts)
        .cast("binary")).as("data"))

  /** Decode Kinesis-shaped records back to typed rows under an explicit
    * schema — the transform a real Kinesis source output feeds. */
  def kinesisDecode(records: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    records
      .select(from_json(
        unbase64(col("data")).cast("string"), schema, jsonOpts).as("e"))
      .select(col("e.*"))

  def sourceKinesisEnvelope(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    kinesisDecode(kinesisWrap(events), events.schema)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("value")), 2).as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        max(col("ts")).as("max_ts"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** JSON-lines roundtrip over events: a JSON document column (props)
    * nested inside JSON records — the escaping case a Kinesis-style feed
    * hits constantly — plus µs event-time timestamps. The aggregate
    * consumes props THROUGH the roundtrip (sum of the extracted payload
    * key), so corrupt escaping cannot hash-match. */
  def sourceJson(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val dir = tmpDir("json", d)
    events.write.mode("overwrite")
      .option("timestampFormat", tsFmt)
      .json(dir)
    s.read.schema(events.schema)
      .option("timestampFormat", tsFmt)
      .json(dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("value")), 2).as("sum_value"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        max(col("ts")).as("max_ts"))
      .orderBy(col("event_type"))
  }

  /** Query key `source_avro`: Avro container-file roundtrip over orders —
    * the row-oriented interchange format of the Kafka/Kinesis ecosystem,
    * done with the raw avro-1.12.1 runtime (present in the Spark jars
    * dir; no spark-avro DATASOURCE jar ships in this container, so the
    * write and decode ride the public org.apache.avro API directly).
    *
    * Write: each input partition appends its rows to ONE
    * `part_<pid>.avro` container (GenericDatumWriter + DataFileWriter,
    * snappy-less null codec — codec jars are environment-dependent),
    * through the same scheme-dispatched stream the binaryFile stage uses
    * (java.nio locally, Hadoop FS on a shared store). The staging dir is
    * wiped first: container files are named by partition id, so a
    * previous run with a different partition count would otherwise leave
    * stale shards for the glob to double-read.
    *
    * Read: `binaryFile` lifts each container to one row (the natural
    * split grain for right-sized Avro files), and a typed flatMap decodes
    * it with DataFileStream — header schema read from the FILE, the
    * reader-schema evolution point. Timestamps ride the
    * timestamp-micros logical type (a long on the wire), re-lifted with
    * timestamp_micros() — µs-exact both directions.
    *
    * The oracle aggregates the ORIGINAL parquet, so a hash match
    * certifies field-level fidelity of the whole encode→stage→scan→decode
    * loop (binary long zig-zag, UTF-8 strings, IEEE doubles, µs
    * timestamps), not just row counts. */
  def sourceAvro(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = tmpDir("avro", d)
    val orders = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      col("o_totalprice"),
      // o_orderdate is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the
      // session is pinned UTC so the cast is value-identity
      unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"))
    val schemaJson =
      """{"type":"record","name":"Order","fields":[
        |{"name":"o_orderkey","type":"long"},
        |{"name":"o_custkey","type":"long"},
        |{"name":"o_orderpriority","type":"string"},
        |{"name":"o_totalprice","type":"double"},
        |{"name":"odate_us","type":{"type":"long","logicalType":"timestamp-micros"}}
        |]}""".stripMargin
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    // wipe + recreate driver-side (stale partition shards must not
    // survive a re-run with a different partition count)
    val basePath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = basePath.getFileSystem(serConf.value)
    driverFs.delete(basePath, true)
    driverFs.mkdirs(basePath)
    orders.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(serConf.value)
        val name = s"part_$pid.avro"
        // Write attempt-unique, rename into place on success (ADVICE
        // round-15): a zombie first attempt under retry/speculation then
        // writes its own temp file instead of interleaving into the
        // container a later attempt is producing; the atomic replace
        // makes the last finishing attempt the single deterministic
        // winner the binaryFile pass decodes.
        val tmpName = s".part_${pid}_attempt_${tc.taskAttemptId()}.avro.tmp"
        val isLocal = fs.getUri.getScheme == "file"
        // scheme dispatch (the binaryFile-stage lesson): Hadoop's local
        // wrapper costs 20-50x per file vs java.nio
        val out: java.io.OutputStream =
          if (isLocal) {
            new java.io.File(dir).mkdirs()
            java.nio.file.Files.newOutputStream(
              java.nio.file.Paths.get(dir, tmpName))
          } else fs.create(new org.apache.hadoop.fs.Path(base, tmpName), true)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](schema))
        w.create(schema, out)
        try it.foreach { r =>
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("o_orderkey", r.getLong(0))
          rec.put("o_custkey", r.getLong(1))
          rec.put("o_orderpriority", r.getString(2))
          rec.put("o_totalprice", r.getDouble(3))
          rec.put("odate_us", r.getLong(4))
          w.append(rec)
        } finally w.close() // closes `out` too
        if (isLocal) {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(dir, tmpName),
            java.nio.file.Paths.get(dir, name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
        } else {
          val dst = new org.apache.hadoop.fs.Path(base, name)
          fs.delete(dst, false)
          fs.rename(new org.apache.hadoop.fs.Path(base, tmpName), dst)
          ()
        }
      }
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val stream = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(bytes),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        try {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, String, Double, Long)]
          while (stream.hasNext) {
            val rec = stream.next()
            buf += ((rec.get("o_orderkey").asInstanceOf[Long],
              rec.get("o_custkey").asInstanceOf[Long],
              rec.get("o_orderpriority").toString,
              rec.get("o_totalprice").asInstanceOf[Double],
              rec.get("odate_us").asInstanceOf[Long]))
          }
          buf
        } finally stream.close()
      }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice",
        "odate_us")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        Det.round(sum(col("o_totalprice")), 2).as("sum_price"),
        max(col("o_orderkey")).as("max_key"),
        expr("timestamp_micros(max(odate_us))").cast("timestamp_ntz")
          .as("max_date"))
      .orderBy(col("o_orderpriority"))
  }

  /** Query key `source_parquet_footer`: parquet FOOTER introspection —
    * the metadata pass every 100 TB table-maintenance job runs before
    * touching data (compaction planners read row-group sizes, pruning
    * auditors read per-column value counts; the footer IS the table's
    * layout contract). One row per (row group, column chunk) of the
    * lineitem fixture: value count, compressed/uncompressed bytes,
    * statistics null count — read through parquet-hadoop's
    * ParquetFileReader with data pages never opened.
    *
    * Scale: file paths enumerate driver-side (a listing, not a read) and
    * footers decode ON EXECUTORS via a typed flatMap — cost is
    * footer-count-bounded, independent of table bytes. The oracle is
    * DuckDB's parquet_metadata() over the SAME file (via the {{SF_DIR}}
    * substitution in Verify's oracle dump), so a hash match certifies
    * both engines read identical footer physics — row-group row counts,
    * chunk byte sizes, null-count statistics — not a re-aggregation. */
  def sourceParquetFooter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = s"$d/lineitem.parquet"
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(serConf.value)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted.toSeq
      else Seq(root)
    files.toDS()
      .repartition(math.min(files.size, 32))
      .flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), serConf.value))
        try {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
            case (b, rg) =>
              b.getColumns.asScala.toSeq.map { c =>
                (rg.toLong, c.getPath.toDotString, b.getRowCount,
                  c.getValueCount, c.getTotalSize,
                  c.getTotalUncompressedSize,
                  Option(c.getStatistics).map(_.getNumNulls).getOrElse(-1L))
              }
          }
        } finally reader.close()
      }
      .toDF("row_group_id", "path_in_schema", "row_group_num_rows",
        "num_values", "total_compressed_size", "total_uncompressed_size",
        "null_count")
      .orderBy(col("row_group_id"), col("path_in_schema"))
  }

  /** binaryFile roundtrip — the MULTIMODAL ingestion path: opaque payload
    * files land on storage, `format("binaryFile")` lifts them into (path,
    * length, content) rows, and identity joins on a key parsed from the
    * path (the layout every image/audio corpus uses). Here each document
    * body is staged as `doc_<id>.bin` (one task per partition writes its
    * slice — the distributed sink shape), read back through binaryFile,
    * and re-keyed by parsing the filename; output (doc_id, n_bytes) is
    * ORACLE-gated against octet_length(text) on the parquet side, so a
    * hash match certifies byte fidelity of the whole stage→scan→parse
    * loop, not just row counts. pathGlobFilter prunes non-payload files
    * at the LISTING, before any read.
    *
    * Scale: listing parallelizes across the driver's file index; content
    * never shuffles (the only exchange is the final sort of 2-column
    * rows). At real scale the decode step chains here as mapPartitions
    * over `content` — [[graft.ops.LlmPipeline.multimodalBatchInfer]]'s
    * shape. */
  def sourceBinaryFiles(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("bin", d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    // Executors write payloads through the HADOOP FILESYSTEM resolved
    // from the staging path — on a cluster that is the shared store
    // (HDFS/S3A) the driver-side binaryFile listing reads from, so the
    // stage→scan loop is distributed-correct, not a local-mode accident
    // (the r8 form wrote via java.nio to java.io.tmpdir, which only a
    // single-machine session can read back). The SESSION's Hadoop conf
    // ships into the closure (SerializableConfiguration) — a bare
    // `new Configuration()` on executors would drop spark.hadoop.*
    // credentials/endpoints and mis-resolve the scheme.
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    // dir created DRIVER-side so an all-empty-partitions frame (empty
    // documents table) still yields a listable, empty staging dir
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(serConf.value)
      .mkdirs(new org.apache.hadoop.fs.Path(dir))
    docs.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(serConf.value)
          // Scheme dispatch: on a shared store (HDFS/S3A) every payload
          // goes through the Hadoop FS API so driver-side listing sees
          // what executors wrote; when the path resolves to file:// the
          // write degenerates to java.nio with identical semantics —
          // Hadoop's local wrapper costs ~20–50× per small file
          // (checksum siblings + per-create permission plumbing,
          // measured 42 s vs 0.9 s for the sf0.1 staging).
          val local = fs.getUri.getScheme == "file"
          if (local) new java.io.File(dir).mkdirs() else fs.mkdirs(base)
          it.foreach { r =>
            val name = s"doc_${r.getLong(0)}.bin"
            val bytes = r.getString(1).getBytes("UTF-8")
            if (local)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, name), bytes)
            else {
              val out = fs.create(
                new org.apache.hadoop.fs.Path(base, name), true)
              try out.write(bytes)
              finally out.close()
            }
          }
        }
    }
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"))
      .orderBy(col("doc_id"))
  }
}
