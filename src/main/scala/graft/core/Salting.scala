package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigating salted join (SURVEY §4 / the 100 TB posture).
  *
  * When one join key carries a disproportionate share of the fact rows, a
  * plain shuffle join puts that key's whole partition on one task. Salting
  * splits each hot key into `salt` sub-keys on the fact side and replicates
  * the dimension row `salt` times, so the hot key spreads over `salt` tasks.
  * AQE's skew-join handles sort-merge cases adaptively; explicit salting is
  * the deterministic tool when AQE can't see the skew (e.g. aggregations
  * after the join, or non-AQE sinks).
  */
object Salting {

  /** Inner equi-join `fact.factKey == dim.dimKey` with `salt`-way key
    * splitting. Result equals the unsalted join (verified by spec). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salt: Int = 8): DataFrame = {
    require(salt > 0)
    // fact side: deterministic pseudo-random salt from the row content
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(col(factKey), monotonically_increasing_id()), lit(salt)))
    // dim side: replicate each row once per salt value
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Skew-mitigating two-phase count+sum aggregation: partials grouped by
    * (key, salt) spread a hot key over `salt` reducers; the re-aggregate
    * by key alone then touches `salt` rows per key, not the raw stream.
    * Count and decimal-sum re-aggregation are exact, so the result equals
    * the direct groupBy row for row (sk1 proves it against the oracle). */
  def saltedCountSum(df: DataFrame, keyCol: String,
      value: org.apache.spark.sql.Column, salt: Int = 8): DataFrame = {
    require(salt > 0)
    df.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(salt)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(value).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum("__c").as("n"), sum("__s").as("__sum"))
  }
}
