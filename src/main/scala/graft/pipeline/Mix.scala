package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Domain-mixing sampler: rebalance a corpus's per-source token mass toward
  * a target weighting by deterministic down-sampling (the static-mixture
  * discipline of large-corpus training sets — cf. the mixture tables of the
  * public Pile/C4 corpus reports).
  *
  * Given a per-source target weight, each source's keep-rate is
  * `min(1, target_share / actual_token_share)` — sources over their target
  * are thinned, sources at-or-under keep everything (down-sampling only;
  * up-weighting is an epoch-repeat concern, not a data-materialization one).
  * A document survives iff `hash32(text) % 10000 < floor(rate * 10000)`, so
  * the sample is a pure function of the document text: no RNG state, stable
  * under retries/re-partitioning, and replayable row-for-row by the DuckDB
  * oracle (the same md5-derived gate as the stratified sampler).
  *
  * Scale shape: one `groupBy(source)` over the corpus (map-side partial
  * agg), a #sources-row model frame (window over it is a single exchange of
  * that tiny frame, bounded by domain cardinality, never corpus size)
  * broadcast-joined back, then a map-side filter + one final census
  * aggregation. Two corpus-wide shuffles total, both on the low-cardinality
  * source key.
  */
object Mix {

  /** Whitespace token count — the same spelling as the t3 oracle
    * (`len(regexp_extract_all(text, '\S+'))`). */
  private def wsTokens(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("\\S+"), lit(0))).cast("long")

  /** Per-source census of the mixed corpus: (source, rate_bp, n_kept,
    * tokens_kept). `targetWeight` maps the source column to a relative
    * weight (e.g. 3.0 for boosted domains, 1.0 otherwise); shares are
    * weights normalized over the sources PRESENT in the corpus.
    *
    * `rate_bp` is the integer basis-point keep-threshold — exposed so the
    * census is self-describing and the oracle can assert the gate itself,
    * not just the survivor counts.
    */
  def domainMixCensus(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      targetWeight: Column): DataFrame = {
    val tok = docs.select(
      col(sourceCol).as("source"),
      col(textCol).as("text"),
      wsTokens(col(textCol)).as("toks"))

    // #sources-row model frame; the empty-partition window is an exchange
    // of exactly that frame (sum of small-integer doubles is exact, so the
    // normalization is engine-portable bit-for-bit)
    val w = Window.partitionBy(lit(1))
    val rates = tok
      .groupBy("source")
      .agg(sum("toks").as("src_tokens"))
      .withColumn("w", targetWeight)
      .withColumn("total_tokens", sum("src_tokens").over(w))
      .withColumn("total_w", sum("w").over(w))
      .select(
        col("source"),
        floor(lit(10000) *
          least(lit(1.0),
            col("w") / col("total_w") * col("total_tokens") / col("src_tokens")))
          .cast("long").as("rate_bp"))

    tok
      .join(broadcast(rates), "source")
      .filter(Portable.hash32(col("text")) % 10000 < col("rate_bp"))
      .groupBy("source", "rate_bp")
      .agg(count(lit(1)).as("n_kept"), sum("toks").as("tokens_kept"))
  }

  /** Token-budget sequence packing census: assign documents to fixed-budget
    * training sequences by the concat-and-chunk discipline (docs in stable
    * id order, a pack is the `budget`-token window the document STARTS in),
    * then report per-pack document count and token mass. This is the
    * streaming-concat approximation every large pretraining pipeline uses —
    * exact bin-packing is NP-hard and order-destroying; chunked concat is
    * one scan, deterministic, and keeps source locality.
    *
    * Scale shape: the running token total is a window partitioned by
    * `sourceCol` — packing never crosses a domain, and each domain sorts
    * independently. A single hot domain would serialize its own sort (the
    * window partition is the unit of parallelism); at 100 TB the deployment
    * answer is a finer packing key (e.g. source × date shard), which this
    * operator takes as-is via `sourceCol`. No global sort anywhere.
    */
  def tokenPackCensus(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      textCol: String,
      budget: Int): DataFrame = {
    // id alone is not a total order if a source carries duplicate ids —
    // the cumulative sum (and so pack assignment) would then depend on
    // shuffle arrival order. The text-hash tiebreaker makes the order
    // total for any distinct rows; rows equal in (id, text) have equal
    // token counts, so their relative order cannot change any cumulative
    // value. Deterministic replay (the DuckDB oracle re-derives the same
    // packing) needs no unique-id precondition this way.
    val w = Window.partitionBy(col("source")).orderBy(col("id"), col("tiebreak"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col(sourceCol).as("source"),
        col(idCol).as("id"),
        Portable.hash32(col(textCol)).as("tiebreak"),
        wsTokens(col(textCol)).as("toks"))
      .withColumn("cum", sum("toks").over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("toks")) / lit(budget)).cast("long"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("pack_tokens"))
  }
}
