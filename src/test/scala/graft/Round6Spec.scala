package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables
import graft.ops.{Analytics, LlmPipeline}

/** Round-6 operators: each approximate/re-shaped path is pinned against a
  * direct reference computation on the same session.
  *  - decontaminate_ngram joins 64-bit shingle hashes — the reference joins the
  *    raw shingle STRINGS, proving the hash layer adds/drops nothing here.
  *  - join_interval_overlap banded equi-join vs the plain theta join.
  *  - embedding_quantize: range/extreme/round-trip/error-bound invariants.
  *  - agg_entropy vs a driver-side recompute from exact counts.
  */
class Round6Spec extends SparkSpec {

  test("decontaminate_ngram: hash-shingle join == raw-string-shingle join") {
    val W = 12
    val docs = Tables.documents(spark, sf01)
    val toks = split(col("text"), " ")
    val sh = docs.where(size(toks) >= W)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(toks) - lit(W - 1)),
          i => array_join(slice(toks, i, lit(W)), " "))).as("g"))
    val evalSh = sh.where(col("doc_id") < 100).select(col("g")).distinct()
    val cont = sh.where(col("doc_id") >= 100)
      .join(evalSh, Seq("g"), "left_semi").select(col("doc_id")).distinct()
    val expected = docs.where(col("doc_id") >= 100)
      .join(cont, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
    assertSameRows(LlmPipeline.decontaminateNgram(spark, sf01), expected,
      "decontaminate")
  }

  test("decontaminate_ngram: docs shorter than the shingle width always survive") {
    val short = Tables.documents(spark, sf01)
      .where(col("doc_id") >= 100 && size(split(col("text"), " ")) < 12)
      .select(col("doc_id"))
    val kept = LlmPipeline.decontaminateNgram(spark, sf01).select(col("doc_id"))
    assert(short.join(kept, Seq("doc_id"), "left_anti").count() === 0L,
      "a too-short doc was dropped as contaminated")
  }

  test("join_interval_overlap: banded equi-join == plain theta join") {
    val ev = Tables.events(spark, sf01)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sec = unix_timestamp(col("ts"))
    val sess = ev
      .withColumn("brk", when(sec - lag(sec, 1).over(byUser) > 1800, 1).otherwise(0))
      .withColumn("session_idx", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val hourly = ev.where(col("event_type") === "error")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_errors"))
    val avgN = hourly.agg(avg(col("n_errors")).as("avg_n"))
    val inc = hourly.crossJoin(broadcast(avgN))
      .where(col("n_errors").cast("double") >= lit(1.5) * col("avg_n"))
      .select(col("h"), col("n_errors"))
    val theta = sess.join(inc,
        col("s_start") < col("h") + expr("interval 1 hour") &&
          col("h") <= col("s_end"))
      .select(col("user_id"), col("session_idx"),
        col("h").as("incident_hour"), col("n_errors"))
      .orderBy(col("user_id"), col("session_idx"), col("incident_hour"))
    val got = Analytics.joinIntervalOverlap(spark, sf01)
    assert(got.count() > 0, "vacuous: no overlapping session/incident pairs")
    assertSameRows(got, theta, "interval_overlap")
  }

  test("embedding_quantize: range, extremes, CSV round-trip, error bound") {
    val q = LlmPipeline.embeddingQuantize(spark, sf01)
    assert(q.where(col("q_max") > 127 || col("q_min") < -127).count() === 0L)
    // the max-|x| element must land on ±127 exactly
    assert(q.where(col("q_max") =!= 127 && col("q_min") =!= -127).count() === 0L)
    // CSV round-trips to the recomputed quantization, and dequantization
    // error is within half a step per element
    val recomputed = Tables.embeddings(spark, sf01)
      .withColumn("amax", array_max(transform(col("embedding"), abs(_))))
      .where(col("amax") > 0f)
      .select(col("vec_id"), col("embedding"), col("amax"),
        transform(col("embedding"), x =>
          org.apache.spark.sql.functions.round(
            x.cast("double") * (lit(127.0) / col("amax").cast("double")))
            .cast("int")).as("q"))
    val joined = q.drop("amax").join(recomputed, Seq("vec_id"))
    val csvMismatch = joined.where(
      col("q_csv") =!= array_join(transform(col("q"), _.cast("string")), ","))
    assert(csvMismatch.count() === 0L, "q_csv != recomputed quantization")
    val step = col("amax").cast("double") / lit(127.0)
    val badErr = joined.where(!forall(
      zip_with(col("embedding"), col("q"),
        (x, qv) => abs(x.cast("double") - qv.cast("double") * step) <=
          step * 0.5 + lit(1e-9)),
      p => p))
    assert(badErr.count() === 0L, "dequantization error exceeds half a step")
  }

  test("streaming decontamination == batch decontaminate (incremental feed vs static eval set)") {
    // the production shape: an incoming document feed is screened against
    // a broadcast STATIC eval shingle-hash set — a stateless per-row
    // verdict (the operator's own broadcast design), so incremental
    // arrival order cannot change it. The batch decontaminate_ngram
    // output must equal what the stream admits, batch by batch. The
    // verdict uses the SAME shingleHashes64 kernel the operator ships.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val train = docs.filter(_._1 >= 100)
    val evalSet = docs.filter(_._1 < 100)
      .flatMap { case (_, text) => LlmPipeline.shingleHashes64(text, 12) }.toSet
    val bc = spark.sparkContext.broadcast(evalSet)
    val mem = MemoryStream[(Long, String)]
    val kept = mem.toDS()
      .filter { case (_, text) =>
        !LlmPipeline.shingleHashes64(text, 12).exists(bc.value.contains)
      }
      .toDF("doc_id", "text").select(col("doc_id"))
    val q = kept.writeStream.format("memory").queryName("t_decontam")
      .outputMode("append").start()
    // three arrival batches (order must not matter: verdicts are row-local)
    val (b1, rest) = train.splitAt(train.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("t_decontam").select(col("doc_id"))
    val batch = LlmPipeline.decontaminateNgram(spark, sf01).select(col("doc_id"))
    assertSameRows(streamed.orderBy(col("doc_id")), batch.orderBy(col("doc_id")),
      "stream-decontaminate")
    bc.destroy()
  }

  test("text_bm25_topterms: 3 ranks per doc, scores non-increasing in rank, idf sane") {
    val bm = LlmPipeline.textBm25Topterms(spark, sf01)
    val perDoc = bm.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("rn")).as("lo"), max(col("rn")).as("hi"),
        max(when(col("rn") === 1, col("score"))).as("s1"),
        max(when(col("rn") === 3, col("score"))).as("s3"))
    // every doc in this corpus has ≥3 distinct terms → exactly ranks 1..3
    assert(perDoc.where(col("n") =!= 3 || col("lo") =!= 1 || col("hi") =!= 3)
      .count() === 0L, "rank structure broken")
    assert(perDoc.where(col("s3") > col("s1")).count() === 0L,
      "score not non-increasing in rank")
    // BM25 with the +1 idf form is strictly positive for tf ≥ 1
    assert(bm.where(col("score") <= 0).count() === 0L, "non-positive BM25 score")
  }

  test("text_lm_score: log-probs non-positive, bigram counts match token counts") {
    val lm = LlmPipeline.textLmScore(spark, sf01)
    // ln(cb/cu) ≤ 0 always (a bigram can't outnumber its own prefix), so
    // the mean is ≤ 0; exactly 0 only if every bigram is its prefix's sole
    // continuation
    assert(lm.where(col("score") > 0).count() === 0L, "positive log-prob")
    val expected = Tables.documents(spark, sf01)
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 1).cast("long").as("n_expected"))
      .where(col("n_expected") >= 1)
    val joined = lm.join(expected, Seq("doc_id"), "full_outer")
    assert(joined.where(col("n_bigrams").isNull || col("n_expected").isNull ||
      col("n_bigrams") =!= col("n_expected")).count() === 0L,
      "per-doc bigram count != token count - 1")
  }

  test("agg_entropy matches a driver-side recompute from exact counts") {
    val counts = Tables.events(spark, sf01)
      .groupBy(col("user_id"), col("event_type")).count()
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = counts.map { case (u, ns) =>
      val tot = ns.sum.toDouble
      val h = -ns.map { n => (n / tot) * (math.log(n / tot) / math.log(2)) }.sum
      u -> math.floor(h * 10000 + 0.5) / 10000
    }
    val got = Analytics.aggEntropy(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, h) =>
      assert(math.abs(h - expected(u)) <= 1e-4 + 1e-12,
        s"user $u: $h vs ${expected(u)}")
    }
  }
}
