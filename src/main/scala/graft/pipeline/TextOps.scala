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

  /** Distinct word n-gram shingles of a token-ARRAY column. Callers must
    * bind the token array to a named column first (see [[shingleTable]]):
    * Catalyst does not common-subexpression-eliminate inside higher-order
    * lambdas, so passing `tokens(text)` here directly re-runs the regex
    * split for every `element_at` — ~3n evaluations per row, which turned
    * the shingle scan into the dominant cost of every dedup operator. */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** ALL word n-grams of a token-ARRAY column, one per position — NOT
    * deduplicated (unlike [[shinglesOfTokens]]): repetition measures and
    * frequency censuses need every occurrence to count. Same
    * bind-the-token-array-first caveat as [[shinglesOfTokens]].
    * DuckDB: list_transform(generate_series(1, greatest(len(w)-(n-1), 0)),
    * i -> w[i]||' '||…). */
  def gramsOfTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(size(toks) >= n, grams).otherwise(array())
  }

  /** Distinct word n-gram shingles of a text column.
    * DuckDB: list_transform(generate_series(1, len(w)-(n-1)), i -> w[i]||' '||…).
    * (Single-column convenience — inside operators prefer the two-step
    * [[shingleTable]] form for the reason on [[shinglesOfTokens]].) */
  def shingles(text: Column, n: Int = 3): Column = shinglesOfTokens(tokens(text), n)

  /** Normalized text: lower, whitespace collapsed, trimmed.
    * DuckDB: trim(regexp_replace(lower(x), '\s+', ' ', 'g')). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: 60-bit hash of the normalized text. */
  def fingerprint(text: Column): Column = Portable.hash60(normalize(text))

  /** Exploded (id, shingle) pairs, one row per distinct shingle. The token
    * array is bound to a column of its own projection so the regex split
    * runs ONCE per document (CollapseProject keeps non-cheap multi-use
    * aliases un-inlined; see [[shinglesOfTokens]]). */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("w"))
      .select(col("id"), explode(shinglesOfTokens(col("w"), n)).as("s"))
}
