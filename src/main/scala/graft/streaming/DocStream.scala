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

  /** Streaming ingest-dedup: drop incoming documents whose content
    * fingerprint (60-bit hash of the normalized text — the same
    * [[TextOps.fingerprint]] the batch dedup operators key on) already
    * exists in the static curated corpus.
    *
    * Deliberately STATELESS: the corpus side is a static fingerprint set
    * joined per micro-batch (broadcast — a fingerprint is 8 bytes, so even
    * a billion-doc corpus is index-sized, and past the broadcast budget
    * the same anti-join degrades to a shuffled one), so there is no
    * streaming state to bound and no watermark to reason about. In-stream
    * re-deliveries WITHIN the feed are not this operator's contract — a
    * stateful `dropDuplicates` over an unbounded doc feed would grow
    * state forever (documents carry no event time to watermark on); feeds
    * needing it run the batch dedup operators on the admitted output
    * downstream. */
  def ingestDedup(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusFps = corpus
      .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .join(broadcast(corpusFps), Seq("fp"), "left_anti")
      .drop("fp")
  }
}
