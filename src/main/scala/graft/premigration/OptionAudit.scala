package graft.premigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's server-option audits at full list cardinality
  * (`/root/reference/Pre_Migration/pre_migration.py:633-723`): distinct
  * `Permanent` rows of `sp_iqcheckoptions()` intersected with the
  * not-customer-settable option lists (`dbopts_noncustomer.csv`, 108 rows;
  * `hosparams_noncustomer.csv`, 663 rows), one finding per common option.
  *
  * Faithfully preserved quirk: the reference only REPLACES the option list
  * with the intersection when the intersection is non-empty
  * (`if (set(t) & set(l))`, pre_migration.py:669-673) — an empty
  * intersection therefore reports every Permanent option. The guard is
  * evaluated on catalog-sized data (an option census, never row data).
  */
object OptionAudit {

  /** (option_name, comment) findings, sorted for the oracle compare. */
  def unsupportedOptions(checkOptions: DataFrame, noncustomer: Seq[String],
      comment: String): DataFrame = {
    val spark = checkOptions.sparkSession
    import spark.implicits._
    val perm = checkOptions.filter(col("option_type") === "Permanent")
      .select("option_name").distinct()
    val list = noncustomer.toDF("option_name")
    // localCheckpoint: the emptiness probe AND the returned relation both
    // consume the intersection — materialize it once (option censuses are
    // catalog-sized) instead of running the distinct+semi-join twice
    val inter = perm.join(list, Seq("option_name"), "left_semi").localCheckpoint()
    // reference fallthrough: empty intersection ⇒ the full Permanent census
    val res = if (inter.isEmpty) perm else inter
    res.select(col("option_name"), lit(comment).as("comment"))
      .orderBy("option_name")
  }
}

/** Deterministic full-cardinality mirrors of the two option lists and the
  * sp_iqcheckoptions() census. Names are synthetic (the lists' CONTENT is
  * SAP data; their cardinality and the intersection shape are what the
  * operator must survive): 108 SA options, 663 IQ host params, with every
  * 4th / 7th set Permanent (intersections of 27 and 94), plus
  * customer-settable Permanent options that must not surface, non-Permanent
  * rows the type filter drops, and duplicate rows the distinct removes. */
object OptionsFixture {

  val dbOptsNoncustomer: Seq[String] = (1 to 108).map(i => f"sa_opt_$i%03d")

  val hosParamsNoncustomer: Seq[String] = (1 to 663).map(i => f"iq_hos_$i%03d")

  val checkOptions: Seq[(String, String)] =
    dbOptsNoncustomer.filter(_.drop(7).toInt % 4 == 0).map((_, "Permanent")) ++
      hosParamsNoncustomer.filter(_.drop(7).toInt % 7 == 0).map((_, "Permanent")) ++
      (1 to 50).map(i => (f"cust_opt_$i%03d", "Permanent")) ++
      Seq(("sa_opt_002", "Temporary"), ("iq_hos_003", "Current"), // dropped by type
        ("sa_opt_004", "Permanent"), ("iq_hos_007", "Permanent")) // dup → distinct

  def checkOptionsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    checkOptions.toDF("option_name", "option_type")
  }

  // ---- VALUES literals for the DuckDB oracle ----
  def listLiteral(vs: Seq[String]): String =
    vs.map(v => s"('$v')").mkString("(VALUES ", ", ", ") AS t(option_name)")
  def checkOptionsLiteral: String =
    checkOptions.map { case (n, t) => s"('$n', '$t')" }
      .mkString("(VALUES ", ", ", ") AS t(option_name, option_type)")
}
