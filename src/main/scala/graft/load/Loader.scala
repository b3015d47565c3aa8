package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load phase with verify-and-rollback semantics (SURVEY §2.9 C5).
  *
  * The reference generates per-table `LOAD TABLE … ; IF cnt != expected THEN
  * ROLLBACK` blocks (`/root/reference/Migration/migration.py:1461-1566`) and
  * re-counts after load (`load_table.sh:36-87`). Spark writes aren't
  * transactional, so the equivalent is staged-write + count-verify + atomic
  * promote: write to a staging dir, count it, and only on match move it to
  * the final location. Failure leaves the previous committed data intact —
  * the same table-level atomicity the server transaction gave the reference.
  */
object Loader {

  final case class LoadResult(tableName: String, expected: Long, loaded: Long, ok: Boolean)

  /** Stage → verify → promote one table. Returns the verify record. */
  def loadVerified(df: DataFrame, expected: Long, finalDir: String): LoadResult = {
    val staging = finalDir + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val spark = df.sparkSession
    val loaded = spark.read.parquet(staging).count()
    val ok = loaded == expected
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val finalPath = new org.apache.hadoop.fs.Path(finalDir)
    if (ok) {
      if (fs.exists(finalPath)) fs.delete(finalPath, true)
      fs.rename(stagingPath, finalPath)
    } else {
      fs.delete(stagingPath, true) // rollback analog
    }
    LoadResult(finalDir.split('/').last, expected, loaded, ok)
  }

  /** Final reconciliation (load_schema_and_data.py:776-820): extracted vs
    * loaded anti-join; empty result is the all-clear invariant. */
  def unloadedTables(extracted: DataFrame, loaded: DataFrame, key: String): DataFrame =
    extracted.join(loaded, Seq(key), "left_anti")
}
