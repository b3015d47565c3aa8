package graft.extract

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9: per-row LOB file sink + binaryFile read-back.
  *
  * The reference extracts LOB columns one file per non-null cell, named
  * `<tableId>_row<rowid>.<columnId>` via server-side BFILE()
  * (`/root/reference/Migration/migration.py:2262-2296`). Spark shape:
  * `foreachPartition` writing files named from the row's stable id —
  * distributed, no driver collect; read back with the `binaryFile` source.
  *
  * rowid() has no Spark equivalent with identical stability; we use the
  * row's own key column (the engine's documented deviation, SURVEY §7.4).
  */
object LobSink {

  /** Write one file per row: dir/<tableId>_row<id>.<colId>. Returns count. */
  def writePerRow(df: DataFrame, idCol: String, lobCol: String,
      dir: String, tableId: Int, colId: Int): Long = {
    Files.createDirectories(Paths.get(dir))
    val cnt = df.sparkSession.sparkContext.longAccumulator("lob_files")
    df.select(col(idCol).cast("long"), col(lobCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val p = Paths.get(dir, s"${tableId}_row${r.getLong(0)}.$colId")
            Files.write(p, r.getAs[Array[Byte]](1))
            cnt.add(1)
          }
        }
      }
    cnt.value
  }

  /** Read a per-row LOB directory back as (path, length, content). */
  def readBack(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length"), col("content"))
}
