package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: language-ID heuristic, quality scoring, token
  * counting, fingerprinting. Pure Catalyst built-ins (regexp_count /
  * regexp_extract_all / length) — codegen'd, pushdown-friendly, and each with
  * an exact DuckDB spelling for the oracle.
  */
object TextAnalysis {

  /** Marker word-lists per language for the n-gram/stopword heuristic.
    * Deliberately tiny and fixed: the operator contract is determinism, not
    * linguistic accuracy. */
  val MARKERS: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|los|las|y|es)\\b")

  private def score(textLc: Column, pattern: String): Column =
    regexp_count(textLc, lit(pattern))

  /** Predicted language: argmax marker count with fixed priority order
    * (en > de > fr > es), 'und' when all zero. */
  def langId(text: Column): Column = {
    val lc = lower(text)
    val scores = MARKERS.map { case (lang, pat) => lang -> score(lc, pat) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Quality features per document: char length, token count, mean token
    * length, stopword ratio, non-alnum ratio — all rounded for stability. */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val lc = lower(txt)
    val nTokens = size(regexp_extract_all(txt, lit("\\S+"), lit(0)))
    val nStop = regexp_count(lc, lit("\\b(the|a|of|to|and|is|in)\\b"))
    val nNonAlnum = regexp_count(lc, lit("[^a-z0-9\\s]"))
    docs.select(
      col(idCol),
      length(txt).as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      round(length(regexp_replace(txt, "\\s+", "")).cast("double") /
        greatest(nTokens, lit(1)), 4).as("mean_token_len"),
      round(nStop.cast("double") / greatest(nTokens, lit(1)), 4).as("stopword_ratio"),
      round(nNonAlnum.cast("double") / greatest(length(txt), lit(1)), 4).as("non_alnum_ratio"))
  }

  /** Composite quality score in [0,1]: length band + stopword signal −
    * symbol noise; deterministic arithmetic only. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityFeatures(docs, idCol, textCol)
      .withColumn("quality",
        round(least(lit(1.0),
          col("n_tokens").cast("double") / 100.0 * 0.5 +
            least(col("stopword_ratio") * 5.0, lit(0.3)) +
            (lit(0.2) - least(col("non_alnum_ratio") * 2.0, lit(0.2)))), 4))

  /** Repetition signals per document (the Gopher/C4 family of quality
    * filters — Rae et al. 2021 §A1.1, public): duplicated-word fraction and
    * the fraction of bigram slots taken by the single most frequent bigram.
    * The corpus here has no line structure, so the word/n-gram measures are
    * the meaningful subset; all arithmetic is exact integer counting until
    * the final rounded ratios.
    *
    * Scale shape: the bigram mode needs a per-(doc, gram) count — one
    * shuffle on (id, gram) with map-side partial aggregation, then a
    * struct-max per doc; nothing driver-side and no window over the raw
    * gram stream. */
  def repetitionFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("w"))
    val base = tok.select(
      col("id"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct_words"))
    val top = tok
      .select(col("id"), explode(TextOps.gramsOfTokens(col("w"), 2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_bigram_n"))
    base.join(top, Seq("id"), "left_outer")
      .select(
        col("id").as(idCol),
        col("n_words"),
        round(lit(1.0) - col("n_distinct_words") / col("n_words"), 4)
          .as("dup_word_frac"),
        round(coalesce(col("top_bigram_n"), lit(0L)) /
          greatest(col("n_words") - 1, lit(1L)), 4).as("top_bigram_frac"))
  }

  /** Corpus-wide n-gram census: the `limit` most frequent word n-grams with
    * occurrence counts — the boilerplate/repeated-passage detector (the
    * census that seeds "remove documents dominated by the corpus's hottest
    * passages" filters). One shuffle on the gram with map-side combine; the
    * top-`limit` is a TakeOrdered, never a global sort. */
  def ngramCensus(docs: DataFrame, textCol: String, n: Int, limit: Int): DataFrame =
    docs.select(TextOps.tokens(col(textCol)).as("w"))
      .select(explode(TextOps.gramsOfTokens(col("w"), n)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("s"))
      .limit(limit)

  /** C4-style per-document quality gates (Raffel et al. 2020 §2.2's
    * heuristic battery, public; the word-level complements live in
    * [[repetitionFeatures]]): terminal punctuation, sentence census,
    * words-per-sentence band, symbol-noise ratio, a fixed boilerplate
    * word-list, and the composed `keep` verdict. Pure codegen'd built-ins —
    * one projection over the corpus scan, no shuffle at all; each measure
    * has an exact DuckDB spelling so the whole battery is hash-gated.
    * The word list is deliberately tiny and fixed: the operator contract is
    * determinism, not content moderation. */
  def c4Gates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val endsPunct = regexp_count(txt, lit("[.!?\"]\\s*$")) > 0
    val nSentences = regexp_count(txt, lit("[.!?]+"))
    val nTokens = size(regexp_extract_all(txt, lit("\\S+"), lit(0)))
    val nSymbols = regexp_count(txt, lit("[#{}<>|@]"))
    val badHits = regexp_count(lower(txt),
      lit("\\b(click here|subscribe now|lorem ipsum)\\b"))
    val wordsPerSentence = nTokens.cast("double") / greatest(nSentences, lit(1))
    val symbolRatio = nSymbols.cast("double") / greatest(length(txt), lit(1))
    docs.select(
      col(idCol),
      endsPunct.as("ends_with_punct"),
      nSentences.cast("long").as("n_sentences"),
      round(wordsPerSentence, 4).as("words_per_sentence"),
      round(symbolRatio, 4).as("symbol_ratio"),
      badHits.cast("long").as("bad_word_hits"),
      (endsPunct && nSentences >= 2 && wordsPerSentence.between(3, 60) &&
        symbolRatio < 0.1 && badHits === 0).as("keep"))
  }

  /** Corpus-level sentence-dedup census — the sentence analog of C4's
    * repeated-line removal (Raffel et al. 2020 §2.2 drop three-sentence
    * spans occurring more than once in the corpus): per document, how many
    * distinct sentences it has and how many of them also occur in ANOTHER
    * document. One shuffle on the sentence value with map-side combine; at
    * 100 TB the census is the standard precursor to boilerplate removal. */
  def sentenceDedupCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sentences = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "[.!?]+")).as("x"))
      .select(col("id"), trim(col("x")).as("sent"))
      .filter(col("sent") =!= "")
      .distinct()
    val census = sentences.groupBy("sent")
      .agg(countDistinct(col("id")).as("nd"))
    sentences.join(census, Seq("sent"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_unique_sentences"),
        sum(when(col("nd") > 1, 1).otherwise(0)).cast("long").as("n_shared_sentences"))
      .select(col("id").as(idCol), col("n_unique_sentences"), col("n_shared_sentences"))
  }

  /** Benchmark decontamination (the n-gram–overlap removal list every
    * public LLM training pipeline runs against its eval sets — e.g.
    * GPT-3 appendix C / PaLM's 13-gram variant): a train document is
    * contaminated when it shares at least one word n-gram with any eval
    * document. Returns (idCol, n_matched) for contaminated train docs
    * only — n_matched counts DISTINCT shared n-grams — which is the
    * removal list a curation job anti-joins against.
    *
    * 100 TB posture: eval sets are benchmark-sized by contract (at most
    * a few million distinct n-grams), so their distinct-gram table is
    * broadcast — the corpus side stays a map-side semi-join riding the
    * documents scan, no corpus shuffle until the per-doc count (which is
    * keyed on the already-distinct (doc, gram) pairs). If an eval corpus
    * ever exceeds the broadcast budget, drop the hint and the same plan
    * degrades to a shuffled join; nothing else changes. */
  def decontaminationHits(train: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    def grams(docs: DataFrame, cols: Column*): DataFrame = docs
      .select(cols :+ TextOps.tokens(col(textCol)).as("w"): _*)
      .select(cols :+ explode(TextOps.gramsOfTokens(col("w"), n)).as("gram"): _*)
    val evalGrams = grams(evalDocs).distinct()
    grams(train, col(idCol)).distinct()
      .join(broadcast(evalGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("n_matched"))
  }

  /** Token counts: whitespace tokens and BPE-ish sub-tokens
    * (letter runs / digit runs / single symbols). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    docs.select(
      col(idCol),
      size(regexp_extract_all(txt, lit("\\S+"), lit(0))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(txt), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_ish_tokens"))
  }
}
