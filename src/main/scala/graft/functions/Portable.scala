package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-portable primitives.
  *
  * Everything here has a bit-identical DuckDB spelling, so any operator built
  * from these can be verified against the driver's DuckDB oracle:
  *
  *  - `hash32(c)`  == `CAST(('0x' || substr(md5(c),1,8)) AS BIGINT)`
  *  - `hash60(c)`  == `CAST(('0x' || substr(md5(c),1,15)) AS BIGINT)`
  *  - `dsum(c, s)` == `CAST(sum(CAST(c AS DECIMAL(18,s))) AS DOUBLE)`
  *
  * Why: Spark's `hash`/`xxhash64` and DuckDB's `hash` are different functions,
  * and summing raw doubles is order-dependent, so neither can anchor a
  * hash-compared oracle. md5 is standardized everywhere, and decimal addition
  * is exact and associative. All md5-derived hashes stay non-negative
  * (< 2^60 fits a Long), which also sidesteps signed/unsigned cast mismatch.
  *
  * These are codegen'd built-ins under the hood (md5/substring/conv), so the
  * whole pipeline stays inside WholeStageCodegen — no UDF boundary.
  */
object Portable {

  /** 32-bit non-negative hash of a string column, identical across engines. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit non-negative hash (15 hex chars keeps it under Long.MaxValue). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact money-sum: per-row cast to DECIMAL(18,scale), exact decimal
    * addition (associative ⇒ partition-order independent), final double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal average rendered as a rounded double. */
  def davg(c: Column, scale: Int = 2, outScale: Int = 6): Column =
    round(sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1)), outScale)

  /** Whitespace-token count (regexp-based; `\S+` means the same in Java
    * regex and RE2, so DuckDB's regexp_extract_all agrees). */
  def tokenCount(c: Column): Column = size(regexp_extract_all(c, lit("\\S+"), lit(0)))

  // DuckDB spellings for oracle SQL construction ---------------------------

  def sqlHash32(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT)"

  def sqlHash60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** The VARCHAR hop is load-bearing: DuckDB's direct DECIMAL→DOUBLE cast
    * double-rounds (int128 → double, then ÷10^scale — two roundings),
    * which at sf1 magnitudes lands 1 ulp BELOW the true value (measured:
    * q1 sum_charge 51076600845.660483 → …66048 direct vs …660484 via
    * strtod). Spark's BigDecimal.doubleValue rounds correctly, so the
    * oracle must render through the correctly-rounded string path to
    * hash-match at every tier. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(CAST(sum(CAST(($expr) AS DECIMAL(18,$scale))) AS VARCHAR) AS DOUBLE)"
}
