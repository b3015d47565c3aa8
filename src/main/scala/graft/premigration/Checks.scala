package graft.premigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Pre-migration audit (SURVEY §3.1): a sequence of feature checks, each
  * producing a scalar finding count, unioned into one findings relation —
  * mirroring `/root/reference/Pre_Migration/pre_migration.py:856-905`'s
  * dispatch over ~21 checks appending `(feature, comment)` tuples.
  *
  * Each check is a single aggregate job; the union is a tiny DataFrame.
  */
object Checks {

  final case class Check(name: String, description: String,
      count: (SparkSession, String) => DataFrame)

  /** Data-quality / compatibility checks over the migrated tables. */
  val all: Seq[Check] = Seq(
    Check("orders_without_lines", "orders having no lineitems (dangling FK)",
      (s, dir) => Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),
    Check("customers_without_orders", "customers with no orders",
      (s, dir) => Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),
    Check("negative_balances", "customer accounts in the red",
      (s, dir) => Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") < 0).agg(count(lit(1)).as("n"))),
    Check("empty_documents", "documents with no text",
      (s, dir) => Tables.load(s, dir, "documents")
        .filter(length(col("text")) === 0).agg(count(lit(1)).as("n"))))

  /** The findings relation: (check_name, finding_count, action_required). */
  def findings(spark: SparkSession, sfDir: String): DataFrame =
    all.map { c =>
      c.count(spark, sfDir)
        .select(
          lit(c.name).as("check_name"),
          col("n").cast("long").as("finding_count"),
          (col("n") > 0).as("action_required"))
    }.reduce(_.unionByName(_)).orderBy("check_name")
}
