package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Shared text primitives for the dedup / text-analysis operators.
  *
  * Tokenization and shingling are defined once here with exact DuckDB
  * equivalents (regexp `\S+` split, word n-grams) so every operator built on
  * them stays oracle-verifiable. All expressions are Catalyst built-ins —
  * no UDFs — so scans stay inside WholeStageCodegen and push down at 100 TB.
  */
object TextOps {

  /** Lower-cased whitespace tokens. DuckDB: regexp_split_to_array(lower(x), '\s+'). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct word n-gram shingles of a text column.
    * DuckDB: list_transform(generate_series(1, len(w)-(n-1)), i -> w[i]||' '||…).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Normalized text: lower, whitespace collapsed, trimmed.
    * DuckDB: trim(regexp_replace(lower(x), '\s+', ' ', 'g')). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: 60-bit hash of the normalized text. */
  def fingerprint(text: Column): Column = Portable.hash60(normalize(text))

  /** Exploded (id, shingle) pairs, one row per distinct shingle. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("s"))
}
