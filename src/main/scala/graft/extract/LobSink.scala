package graft.extract

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.SerializableHadoopConf

/** S9: per-row LOB file sink + binaryFile read-back.
  *
  * The reference extracts LOB columns one file per non-null cell, named
  * `<tableId>_row<rowid>.<columnId>` via server-side BFILE()
  * (`/root/reference/Migration/migration.py:2262-2296`). Spark shape:
  * `foreachPartition` writing files named from the row's stable id —
  * distributed, no driver collect; read back with the `binaryFile` source.
  * Files go through the Hadoop FileSystem resolved from the DRIVER's
  * configuration (shipped via [[SerializableHadoopConf]]), so the sink
  * writes to hdfs:///object-store paths the same as to file:// — executors
  * writing java.nio local paths would scatter files across worker disks.
  *
  * rowid() has no Spark equivalent with identical stability; we use the
  * row's own key column (the engine's documented deviation, SURVEY §7.4).
  */
object LobSink {

  /** Write one file per row: dir/<tableId>_row<id>.<colId>. Returns count. */
  def writePerRow(df: DataFrame, idCol: String, lobCol: String,
      dir: String, tableId: Int, colId: Int): Long = {
    val driverConf = df.sparkSession.sparkContext.hadoopConfiguration
    new Path(dir).getFileSystem(driverConf).mkdirs(new Path(dir))
    val hconf = new SerializableHadoopConf(driverConf)
    val cnt = df.sparkSession.sparkContext.longAccumulator("lob_files")
    df.select(col(idCol).cast("long"), col(lobCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new Path(dir).getFileSystem(hconf.value)
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val out = fs.create(new Path(dir, s"${tableId}_row${r.getLong(0)}.$colId"), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
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
