package graft

/** Round-17 optimization pins: overlapped-job pool semantics (the r16
  * driver-test failure), plus cross-path equivalence pins for every
  * operator this round restructures. */
class Round17OptSpec extends SparkSpec {

  test("Pools.runAll awaits EVERY sibling before rethrowing the first failure") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val err = intercept[RuntimeException] {
      Pools.runAll("graft-test-pool", 3, Seq(
        () => { Thread.sleep(50); done.incrementAndGet(); () },
        () => throw new RuntimeException("boom-first"),
        () => { Thread.sleep(200); done.incrementAndGet(); () },
        () => { Thread.sleep(200); done.incrementAndGet(); () }))
    }
    assert(err.getMessage == "boom-first")
    // all three non-failing tasks ran to completion before the rethrow
    assert(done.get() == 3)
    // and no pool thread outlives the call
    assert(Pools.liveWorkerNames().isEmpty)
  }

  test("Pools.runAll rethrows the first failure by TASK order, not by time") {
    val err = intercept[RuntimeException] {
      Pools.runAll("graft-test-pool", 2, Seq(
        () => { Thread.sleep(150); throw new RuntimeException("slow-early") },
        () => throw new RuntimeException("fast-late")))
    }
    assert(err.getMessage == "slow-early")
  }

  test("uniViterbiTrie == uniViterbi on every fixture word (trained table)") {
    import org.apache.spark.sql.functions._
    val (pieces, _) = ops.LlmPipeline.trainUnigram(spark, sf001)
    val lp = ops.LlmPipeline.uniLogProbs(pieces.toSeq)
    val trie = ops.LlmPipeline.UniTrie.of(lp)
    val words = io.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val a = ops.LlmPipeline.uniViterbi(w, lp)
      val b = ops.LlmPipeline.uniViterbiTrie(w, trie)
      assert(a == b, s"divergence on '$w': map=$a trie=$b")
    }
    // adversarial tie shapes beyond the fixture: words built from pieces
    // with equal log-probs exercise the smallest-j tie rule
    val tieLp = Map("a" -> -10L, "aa" -> -20L, "aaa" -> -30L, "b" -> -7L,
      "ab" -> -17L, "ba" -> -17L)
    val tieTrie = ops.LlmPipeline.UniTrie.of(tieLp)
    Seq("a", "aa", "aaa", "aaaa", "ab", "ba", "abab", "baba", "aab",
      "aba", "baab").foreach { w =>
      val a = ops.LlmPipeline.uniViterbi(w, tieLp)
      val b = ops.LlmPipeline.uniViterbiTrie(w, tieTrie)
      assert(a == b, s"tie divergence on '$w': map=$a trie=$b")
    }
  }

  test("bpeSymbolCount == the naive one-pass-per-merge sweep on every fixture word") {
    import org.apache.spark.sql.functions._
    def naive(w: String, ms: Array[(String, String, String)]): Int = {
      var syms: Array[String] = w.split("")
      ms.foreach { case (l, r, m) =>
        if (syms.length > 1) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += m; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
        }
      }
      syms.length
    }
    val ms = ops.LlmPipeline.bpeMerges(spark, sf001).map(m => (m._2, m._3, m._4))
    val rank = new java.util.HashMap[(String, String), Integer]()
    ms.zipWithIndex.foreach { case ((l, r, _), i) => rank.put((l, r), i) }
    val words = io.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val a = naive(w, ms)
      val b = ops.LlmPipeline.bpeSymbolCount(w, ms, rank)
      assert(a == b, s"divergence on '$w': naive=$a rankLoop=$b")
    }
  }

  test("Pools.mapAll preserves task order") {
    val out = Pools.mapAll("graft-test-pool", 3,
      (1 to 7).map(i => () => { Thread.sleep((7 - i) * 10L); i * i }))
    assert(out == (1 to 7).map(i => i * i))
  }
}
