package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Round-11d corpus-release operators (SURVEY.md §2.23): the data-card
  * report a corpus publication ships with, and the broadcast-term
  * blocklist gate a curation pipeline runs before anything expensive.
  *
  * Both oracle-gated: scalar columns, total row order, exact-integer
  * cores with one final snap on each derived double (§5.3).
  */
object Corpus {

  /** The 1e-6 snap used on every derived double in this file: floor of
    * the scaled value + 0.5 — the repo-wide grid recipe (Det.round is
    * HALF_UP on BigDecimal; this plain-arithmetic spelling is what the
    * DuckDB twins replay verbatim). */
  private def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Query key `pipeline_corpus_card`: the composed corpus DATA CARD —
    * the one-table release artifact every published training corpus
    * carries (mixture by language and source, exact-duplication rate,
    * quality-gate survival, length profile), as a uniform
    * (section, key, metric, value) frame:
    *
    *   - `lang` / `source`: document and whitespace-token counts per
    *     stratum — the mixture table a sampling config is written from;
    *   - `dup`: whole-corpus exact-duplicate fraction
    *     (1 − distinct sha256 digests / docs), the headline dedup number;
    *   - `quality`: survival fraction of the pipelineCorpusCurate gate
    *     (≥ 5 tokens and distinct-token ratio ≥ 0.3);
    *   - `len`: min / mean / max token counts.
    *
    * Every section is ONE partial-aggregable pass over a projection of
    * documents (counts and integer sums only — the single full-data scan
    * is shared by Catalyst when sections reuse the same base); the union
    * is plan-level. All values are exact integers or one
    * integer-over-integer divide snapped at 1e-6, so the DuckDB oracle
    * composes the same section bodies verbatim and the COMPOSITION is
    * hash-gated (pipeline_drift_report's recipe).
    *
    * Scale: per-section shuffles are bounded by the stratum domain
    * (|lang| = 5, |source| = 20) or are single-row global aggregates of
    * partial-aggregable sums; nothing keys on doc_id. At 100 TB the card
    * costs one documents scan + five tiny reductions. */
  def pipelineCorpusCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = size(split(col("text"), " "))
    def shaped(section: String, key: Column, metric: String, value: Column,
        src: DataFrame): DataFrame =
      src.select(lit(section).as("section"), key.cast("string").as("key"),
        lit(metric).as("metric"), value.cast("double").as("value"))

    val byLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("n_tokens"))
    val bySource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val dup = docs.agg(count(lit(1)).as("n"),
        countDistinct(sha2(col("text"), 256)).as("nd"))
      .select(snap6((col("n") - col("nd")).cast("double") /
        col("n").cast("double")).as("frac"))
    val quality = docs
      .select(toks.as("t"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          toks.cast("double")).as("dr"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("t") >= 5 && col("dr") >= 0.3, 1L).otherwise(0L))
          .as("kept"))
      .select(snap6(col("kept").cast("double") / col("n").cast("double"))
        .as("frac"))
    val len = docs.agg(min(toks).as("mn"), max(toks).as("mx"),
      sum(toks).as("st"), count(lit(1)).as("n"))

    shaped("lang", col("lang"), "n_docs", col("n_docs"), byLang)
      .unionAll(shaped("lang", col("lang"), "n_tokens", col("n_tokens"), byLang))
      .unionAll(shaped("source", col("source"), "n_docs", col("n_docs"), bySource))
      .unionAll(shaped("dup", lit("corpus"), "exact_dup_frac", col("frac"), dup))
      .unionAll(shaped("quality", lit("corpus"), "kept_frac", col("frac"), quality))
      .unionAll(shaped("len", lit("corpus"), "min_tokens", col("mn"), len))
      .unionAll(shaped("len", lit("corpus"), "mean_tokens",
        snap6(col("st").cast("double") / col("n").cast("double")), len))
      .unionAll(shaped("len", lit("corpus"), "max_tokens", col("mx"), len))
      .orderBy(col("section"), col("key"), col("metric"))
  }

  /** The demo blocklist. In production this is a 10⁵-row table loaded
    * from storage; the MECHANICS are identical — a broadcast hash join
    * against the exploded token stream (O(tokens), one map-side probe
    * per word) instead of the O(tokens × terms) regex alternation a
    * naive implementation reaches for. */
  private[graft] val BlockTerms: Seq[String] =
    Seq("slow", "fast", "big", "small", "a", "the")

  /** Query key `text_blocklist_filter`: blocked-term curation gate — the
    * refined-web-style word-blocklist pass that runs FIRST in a curation
    * cascade (cheapest signal, largest cut). A document is flagged when
    * it contains ≥ 3 DISTINCT blocklist terms as whole whitespace tokens
    * (whole-token match, not substring — "fastest" does not hit "fast").
    * Emits flagged docs with the distinct-hit count and the
    * alphabetically first hit (the "why was this dropped" audit column).
    *
    * Spark side: posexplode-free explode of the token array, broadcast
    * hash join against the term table, doc-keyed count-distinct. The
    * shuffle carries only (doc_id, matched term) pairs — at most
    * |blocklist| rows per document survive the join, so network volume
    * is match-bounded, never token-bounded. Oracle-gated: DuckDB unnest
    * + IN composes the identical semantics. */
  def textBlocklistFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = BlockTerms.toDF("term")
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(terms), col("w") === col("term"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("w")).as("n_blocked"),
        min(col("w")).as("first_term"))
      .where(col("n_blocked") >= 3)
      .orderBy(col("doc_id"))
  }
}
