package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.TextOps

/** Structured Streaming surface over the documents table: the LLM-corpus
  * INGESTION shape — new documents arrive as a stream and must be deduped
  * against the already-curated static corpus before they are admitted.
  *
  * Beyond-parity scope like [[EventStream]] (the reference has no
  * streaming); the batch twin is oracle-gated as `st7_ingest_dedup` and
  * stream/batch parity is pinned by StreamingSpec.
  */
object DocStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over the sf directory's documents file(s). */
  def readStream(spark: SparkSession, sfDir: String,
                 glob: String = "documents.parquet"): DataFrame =
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(sfDir)

  /** Hashed-relation footprint per broadcast fingerprint row: the 8-byte
    * key rides in an UnsafeRow inside a LongHashedRelation whose map +
    * page overhead lands the per-row cost in the tens of bytes; 48 is the
    * conservative ceiling the budget math uses. */
  val FpHashedBytes = 48L

  /** Broadcast budget for the corpus fingerprint set — the engine-wide
    * explicit-hint budget ([[graft.core.Engine.broadcastBudget]]). */
  def fpBroadcastBudget(maxHeapBytes: Long = Runtime.getRuntime.maxMemory()): Long =
    graft.core.Engine.broadcastBudget(maxHeapBytes)

  /** Streaming ingest-dedup: drop incoming documents whose content
    * fingerprint (60-bit hash of the normalized text — the same
    * [[TextOps.fingerprint]] the batch dedup operators key on) already
    * exists in the static curated corpus.
    *
    * Deliberately STATELESS: the corpus side is a static fingerprint set
    * joined per micro-batch, so there is no streaming state to bound and
    * no watermark to reason about. In-stream re-deliveries WITHIN the feed
    * are not this operator's contract — a stateful `dropDuplicates` over
    * an unbounded doc feed would grow state forever (documents carry no
    * event time to watermark on); feeds needing it run the batch dedup
    * operators on the admitted output downstream.
    *
    * JOIN STRATEGY is decided by ONE static count job at query-build time,
    * amortized over the stream's lifetime: under [[fpBroadcastBudget]] the
    * fingerprint set gets an explicit broadcast hint (Catalyst's own stats
    * see the corpus TEXT bytes and would refuse); over it the hint is
    * OMITTED and the anti-join plans shuffled. An unconditional hint here
    * would not "degrade" past the budget — Spark attempts a hinted
    * broadcast regardless of size and fails hard at the 8 GB build-side
    * limit, exactly where the billion-doc corpus contract lives
    * (StreamingSpec pins both plan shapes). */
  def ingestDedup(docs: DataFrame, corpus: DataFrame,
      broadcastBudgetBytes: Long = fpBroadcastBudget()): DataFrame = {
    val corpusFps = corpus
      .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    val fits = corpusFps.count() * FpHashedBytes <= broadcastBudgetBytes
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(if (fits) broadcast(corpusFps) else corpusFps, Seq("fp"), "left_anti")
      .drop("fp")
  }
}
