package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (SURVEY §4 / 100 TB posture).
  *
  * A fact⋈fact join (lineitem⋈orders at 100 TB) shuffles both sides every
  * query unless the tables are pre-bucketed on the join key: bucketBy writes
  * each table hash-partitioned into a fixed bucket count, after which joins
  * and aggregations on that key read co-located buckets with NO exchange.
  * This is the write-once/join-many trade the reference approximates with
  * its per-node extract layout (migration.py:1661-1677); in Spark it's
  * first-class.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — with matching bucket
    * counts Spark plans a sort-merge join with zero shuffle exchanges. */
  def cojoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
