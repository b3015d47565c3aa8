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
        .filter(length(col("text")) === 0).agg(count(lit(1)).as("n"))),
    Check("empty_tables", "tables with zero rows (extraction short-circuit)",
      (s, dir) => graft.core.Catalog.tableInventory(s, dir)
        .filter(col("row_count") === 0).agg(count(lit(1)).as("n"))),
    Check("wide_row_tables", "tables whose declared row width exceeds 128 bytes",
      (s, dir) => {
        import s.implicits._
        val wide = graft.core.Tables.names.count(n =>
          graft.core.Catalog.rowWidth(Tables.load(s, dir, n).schema) > 128)
        Seq(wide.toLong).toDF("n")
      }),
    Check("lob_like_columns", "columns needing the LOB extract path (binary/array)",
      (s, dir) => {
        import org.apache.spark.sql.types.{ArrayType, BinaryType}
        import s.implicits._
        val n = graft.core.Tables.names.map(t =>
          Tables.load(s, dir, t).schema.fields.count(f => f.dataType match {
            case _: ArrayType | BinaryType => true
            case _ => false
          })).sum
        Seq(n.toLong).toDF("n")
      }),
    Check("duplicate_orderkeys", "orders with duplicated primary key",
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("n"))),
    Check("future_dates", "events timestamped beyond the extraction window",
      (s, dir) => Tables.load(s, dir, "events")
        .filter(col("ts") > lit("2030-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n"))))

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
