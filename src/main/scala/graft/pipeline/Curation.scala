package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end decontamination: the operator a real training-data pipeline
  * runs before a corpus ships. [[TextAnalysis.decontaminationHits]] and
  * [[Dedup.minhashLshCrossPairs]] each produce a REMOVAL LIST; this
  * composes them — one anti-join of the corpus against the union of both
  * lists — because the two catch different leakage: exact n-gram
  * containment flags verbatim benchmark spans (a single shared 5-gram),
  * fuzzy MinHash-LSH flags paraphrase-level overlap (whole-doc Jaccard at
  * `threshold`) that never shares n consecutive tokens.
  *
  * Scale posture is inherited from the parts, both proven on their own
  * gates (t14, d9): the eval set is benchmark-sized BY CONTRACT, so its
  * grams broadcast and its LSH bucket table broadcasts-by-stats; the
  * corpus side stays map-side for candidacy in both lists and is touched
  * once more by the final anti-join (shuffled on the id — one corpus
  * shuffle, no corpus-corpus join anywhere). Oracle-gated end-to-end as
  * `cur2_decontaminated`.
  */
object Curation {

  /** Training docs surviving BOTH decontamination screens against
    * `evalDocs`: exact `n`-gram containment and fuzzy cross-corpus
    * near-duplication at `threshold`. Returns the surviving corpus rows
    * unchanged (census/aggregation is the caller's choice). */
  def curateDecontaminated(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    val exactHits = TextAnalysis
      .decontaminationHits(corpus, evalDocs, idCol, textCol, n)
      .select(col(idCol))
    val fuzzyHits = Dedup
      .minhashLshCrossPairs(corpus, evalDocs, idCol, textCol, threshold)
      .select(col("id_a").as(idCol))
    corpus.join(exactHits.union(fuzzyHits).distinct(), Seq(idCol), "left_anti")
  }
}
