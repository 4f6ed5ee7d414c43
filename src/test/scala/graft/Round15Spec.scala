package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the sharded (beyond-broadcast) HNSW rung's determinism /
  * exact-score / recall-vs-broadcast properties, the Avro container
  * roundtrip's distributed-sink shape, and the Memo single-computation +
  * served-marker contract behind BENCH_FULL's memo_served field. */
class Round15Spec extends SparkSpec {

  // ------------------------------------------- knn_hnsw_sharded

  test("knn_hnsw_sharded: deterministic across runs; every emitted score equals the brute r4 dot") {
    import spark.implicits._
    val a = ops.LlmPipeline.knnHnswSharded(spark, sf001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val b = ops.LlmPipeline.knnHnswSharded(spark, sf001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(a === b, "two sharded-HNSW runs diverged — a nondeterminism leak")
    assert(a.nonEmpty && a.forall(_._3 >= 0))
    val embOf = graft.io.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(x.length, y.length)) {
        s += x(i).toDouble * y(i).toDouble; i += 1
      }
      s
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000.0
    a.foreach { case (q, _, nb, sc) =>
      assert(sc === r4(dot(embOf(q), embOf(nb))),
        s"score drift for pair ($q, $nb)")
    }
    a.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.forall(_._3 != q), s"query $q returned itself")
      assert(sorted.map(_._3).distinct.length == sorted.length,
        s"query $q emitted a duplicate neighbor — replicated-shard dedup broke")
      assert(sorted.map(r => (-r._4, r._3)) ===
        sorted.map(r => (-r._4, r._3)).sorted,
        s"query $q rank order violates (score desc, id asc)")
    }
  }

  test("knn_hnsw_sharded: partitioning invariance (7 vs 3 shuffle partitions)") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      val a = ops.LlmPipeline.knnHnswSharded(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      conf.set("spark.sql.shuffle.partitions", "3")
      val b = ops.LlmPipeline.knnHnswSharded(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(a.sameElements(b), "sharded HNSW output depends on partitioning")
      assert(a.nonEmpty)
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("knn_hnsw_sharded at sf0.1: recall@3 >= the broadcast hnsw rung at a sub-full candidate fraction") {
    import spark.implicits._
    val sf1 = "/root/testdata/sf0.1"
    val brute = ops.LlmPipeline.knnCosine(spark, sf1)
      .select(col("vec_id"), col("b_id"))
      .as[(Long, Long)].collect().toSet
    val nq = brute.map(_._1).size
    def recallOf(rows: Array[(Long, Long)]): Double =
      rows.count(brute.contains).toDouble / (nq * 3)
    val shardedAll = ops.LlmPipeline.hnswShardedSearchAll(spark, sf1)
      .localCheckpoint()
    val sharded = shardedAll.select(col("vec_id"), col("b_id"))
      .as[(Long, Long)].collect()
    val broadcast = ops.LlmPipeline.hnswSearchAll(spark, sf1)
      .select(col("vec_id"), col("b_id")).as[(Long, Long)].collect()
    val rS = recallOf(sharded)
    val rB = recallOf(broadcast)
    // measured candidate fraction: per-query n_scored over n-1, averaged
    // across the queries present (the ADVICE-r14 unbiased denominator)
    val n = graft.io.Tables.embeddings(spark, sf1).count()
    val perQ = shardedAll.select(col("vec_id"), col("n_scored"))
      .groupBy(col("vec_id")).agg(max(col("n_scored")).as("m"))
      .as[(Long, Long)].collect()
    val frac = perQ.map(_._2).sum.toDouble / (perQ.length.toDouble * (n - 1))
    info(f"sharded recall=$rS%.4f vs broadcast=$rB%.4f; cand frac=$frac%.4f")
    assert(rS >= rB,
      f"sharded recall $rS%.4f fell below the broadcast rung $rB%.4f")
    // r16 knob sweep shipped (16, 2, 48): 0.9228 recall at frac 0.3884 —
    // the band below holds the swept frontier, not just sub-fullness
    assert(frac <= 0.45,
      f"sharded rung scored $frac%.2f of the collection — above the " +
        "swept frontier band (<= 0.45)")
  }

  // ------------------------------------------- source_avro

  test("source_avro stages one container per non-empty partition (distributed sink shape)") {
    // the key itself is oracle-gated; this pins the SINK layout — the
    // write must not have degenerated to a single driver-side file
    val df = graft.io.Formats.sourceAvro(spark, sf01)
    assert(df.count() == 5) // one row per order priority
    val enc = sf01.getBytes("UTF-8").map(b => f"$b%02x").mkString
    val dirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")))
    try {
      val stage = dirs.iterator()
      val found = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
      while (stage.hasNext) {
        val p = stage.next()
        if (p.getFileName.toString.contains(s"_avro_$enc")) found += p
      }
      assert(found.nonEmpty, "no avro staging dir found")
      val parts = java.nio.file.Files.list(found.head)
      try {
        val names = parts.iterator()
        var nAvro = 0
        while (names.hasNext) {
          if (names.next().getFileName.toString.endsWith(".avro")) nAvro += 1
        }
        assert(nAvro >= 1, "no container files staged")
      } finally parts.close()
    } finally dirs.close()
  }

  // ------------------------------------------- harmonic edgeless guard

  test("harmonicFrom: an edgeless graph yields an empty frame, not empty.reduce") {
    import spark.implicits._
    val und = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    val out = ops.Analytics.harmonicFrom(und, k = 16)
    assert(out.columns.toSeq == Seq("part", "n_reached", "harmonic_est"))
    assert(out.count() == 0)
  }

  // ------------------------------------------- report build_sec

  test("ann report: build_sec present and the brute anchor's is positive") {
    Memo.clear() // force a fresh assembly so build_sec is THIS measurement
    val rep = ops.LlmPipeline.pipelineAnnReport(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rep.keySet.size == 8)
    assert(rep.values.forall(_ >= 0.0))
    assert(rep("brute_fp32") > 0.0,
      "brute anchor materialization cannot measure as free")
  }

  // ------------------------------------------- Memo contract

  test("Memo: concurrent consumers share ONE computation; serves are marked for the bench") {
    Memo.clear()
    Memo.drainServed()
    val fp = Some("round15-test-fp")
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            Memo.getOrCompute("r15-kernel", fp) {
              computes.incrementAndGet()
              Thread.sleep(50) // widen the race window
              "value"
            }
        })
      }
      assert(tasks.map(_.get()).toSet == Set("value"))
      assert(computes.get() == 1,
        s"computeIfAbsent contract broke: ${computes.get()} computations")
    } finally pool.shutdown()
    // 15 of the 16 calls were served from cache -> the kernel is marked
    assert(Memo.drainServed() == Set("r15-kernel"))
    // drain clears: a fresh producer-style compute is NOT a serve
    Memo.clear()
    Memo.getOrCompute("r15-kernel", fp)("fresh")
    assert(Memo.drainServed().isEmpty,
      "a cold compute must not mark the kernel as memo-served")
  }
}
