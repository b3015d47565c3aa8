package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S1/S16 live mode: JDBC source + sink (SURVEY §2.1).
  *
  * The reference's entire ingestion is a live server connection
  * (`/root/reference/Migration/migration.py:316-337`, `Common/common.py:
  * 221-247` — pyodbc over an IQ DSN) and its load phase writes back through
  * the same connection (`Migration/load_schema_and_data.py:295-299`). The
  * Spark-native equivalent is the JDBC data source: `spark.read.jdbc` for
  * catalog/table ingestion, `df.write.jdbc` for load — parquet fixtures
  * remain the default (test) mode, this is the live path.
  *
  * Scale shape: a single-partition JDBC read is a one-connection funnel, so
  * [[readPartitioned]] exposes the partitionColumn/bounds form — Spark opens
  * `numPartitions` parallel connections each scanning a key range, which is
  * how a 100 TB table actually leaves a server. Predicates/column pruning
  * push into the remote query (JDBCRelation builds WHERE/SELECT lists).
  *
  * The sandbox has no server, so specs run against embedded Derby (in
  * `/opt/spark/jars`, started in-process via the jdbc:derby: URL).
  */
object Jdbc {

  /** Keep Derby's log out of the working directory (it writes derby.log
    * into user.dir by default). Idempotent. */
  private lazy val quietDerby: Unit = {
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        System.getProperty("java.io.tmpdir") + "/derby.log")
  }

  private def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Live-mode table read: one connection, full scan. */
  def read(spark: SparkSession, url: String, table: String): DataFrame = {
    quietDerby
    spark.read.jdbc(url, table, props())
  }

  /** Parallel live-mode read: `numPartitions` range-partitioned connections
    * over `partitionCol` ∈ [lower, upper] — the form that scales. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame = {
    quietDerby
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props())
  }

  /** Pushed-down COUNT(*) — the v1 JDBC relation does not push aggregates,
    * so a DataFrame count() would drag every row across the connection;
    * this makes the server do it and ships one number. */
  def count(spark: SparkSession, url: String, table: String): Long = {
    quietDerby
    spark.read.jdbc(url, s"(SELECT COUNT(*) AS n FROM $table) count_q", props())
      .head().getAs[Number](0).longValue()
  }

  /** Pushed-down [min, max] bounds of one column — a single-row remote
    * aggregate (issued as a derived-table query, so the server computes it;
    * a v1 DataFrame min/max would pull every row instead). */
  def bounds(spark: SparkSession, url: String, table: String,
      column: String): Option[(Long, Long)] = {
    quietDerby
    // quote the column: Spark's JDBC writer creates case-preserved quoted
    // identifiers, so an unquoted reference would case-fold past them
    val r = spark.read.jdbc(url,
      s"""(SELECT MIN("$column") AS lo, MAX("$column") AS hi FROM $table) bounds_q""",
      props()).head()
    if (r.isNullAt(0) || r.isNullAt(1)) None
    else Some((r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
  }

  /** Live-mode read that SCALES when it can: picks the table's first
    * integral column as the partition key, fetches its pushed-down bounds,
    * and opens `numPartitions` range-partitioned connections — the form a
    * large table actually leaves a server by. Falls back to the
    * one-connection read when no integral column exists or the table is
    * empty/constant-keyed. */
  def readAuto(spark: SparkSession, url: String, table: String,
      numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val plain = read(spark, url, table)
    val partCol = plain.schema.fields.collectFirst {
      case f if Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType) => f.name
    }
    partCol.flatMap(c => bounds(spark, url, table, c).map((c, _))) match {
      case Some((c, (lo, hi))) if hi > lo =>
        readPartitioned(spark, url, table, c, lo, hi, numPartitions)
      case _ => plain
    }
  }

  /** Live-mode load (C5's write half): append/overwrite into a server table.
    * Overwrite maps to the reference's drop-and-reload
    * (load_schema_and_data.py:295-299). */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    quietDerby
    df.write.mode(mode).jdbc(url, table, props())
  }

  /** An embedded-Derby URL for a throwaway database under `dir`. */
  def derbyUrl(dir: String): String = s"jdbc:derby:$dir/graftdb;create=true"

  /** User tables visible through the connection's catalog metadata — the
    * live-mode SYSTABLE scan (S1; reference inventories user tables at
    * migration.py:1691 with system schemas excluded the same way). */
  def listTables(url: String): Seq[String] = {
    quietDerby
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) {
        val schem = Option(rs.getString("TABLE_SCHEM")).getOrElse("")
        if (!schem.toUpperCase.startsWith("SYS")) buf += rs.getString("TABLE_NAME")
      }
      buf.toSeq
    } finally conn.close()
  }

  /** Run one DDL/DML statement on the live connection (the load phase's
    * promote step needs DROP/RENAME, which the DataFrame writer can't
    * express). `ignoreMissingTable` swallows the missing-table states so
    * drop-if-exists works on engines without IF EXISTS (Derby). */
  def execute(url: String, sql: String, ignoreMissingTable: Boolean = false): Unit = {
    quietDerby
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: java.sql.SQLException
            if ignoreMissingTable && Set("42Y55", "42X05").contains(e.getSQLState) => ()
      } finally st.close()
    } finally conn.close()
  }
}
