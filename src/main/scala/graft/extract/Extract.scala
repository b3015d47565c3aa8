package graft.extract

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Extraction phase: planner + executors (SURVEY §2.1 S6-S11, §2.6 O3-O4,
  * §4 physical policy).
  *
  * The reference plans extraction driver-side — LPT-balances tables across
  * MPX nodes with a min-heap (`/root/reference/Migration/migration.py:
  * 1661-1677`), packs size-capped batches (`migration.py:1758-1784`),
  * short-circuits empty tables (`migration.py:1921-1931`), picks the file
  * format per table (`migration.py:2136-2208`) — then lets the server write
  * files in parallel. Our executors are Spark writers; the planner stays
  * driver-side on the collected (catalog-sized) work list, which is correct
  * at any scale: the work list is one row per TABLE, not per data row.
  */
object Extract {

  final case class WorkItem(name: String, rowCount: Long, sizeBytes: Long, tableId: Int)

  sealed trait Format { def ext: String }
  case object GzipText extends Format { val ext = "gz" }
  case object Binary extends Format { val ext = "parquet" }
  case object PlainText extends Format { val ext = "txt" }

  /** LPT (longest-processing-time) greedy assignment over `n` nodes:
    * sort descending, repeatedly give the next table to the least-loaded
    * node (migration.py:1656-1677's heapq). Deterministic: ties broken by
    * node index. */
  def lptAssign(items: Seq[WorkItem], n: Int): Map[String, Int] = {
    require(n > 0)
    // dequeue must yield the LEAST-loaded node: PriorityQueue pops the max
    // of its ordering, so reverse the natural (load, nodeIdx) order.
    val heap = scala.collection.mutable.PriorityQueue
      .empty[(Long, Int)](Ordering.by[(Long, Int), (Long, Int)](identity).reverse)
    (0 until n).foreach(i => heap.enqueue((0L, i)))
    items.sortBy(i => (-i.sizeBytes, i.name)).map { it =>
      val (load, node) = heap.dequeue()
      heap.enqueue((load + it.sizeBytes, node))
      it.name -> node
    }.toMap
  }

  /** Size-capped batch packing (migration.py:1758-1784): ascending by size,
    * greedy fill to `capBytes`; items individually over the cap spill to the
    * no-extraction list (the reference's no_extraction.list behavior).
    * Returns (batches, spilled). Partition property: batches ⊎ spilled ==
    * input, each batch ≤ cap. */
  def batch(items: Seq[WorkItem], capBytes: Long): (Seq[Seq[WorkItem]], Seq[WorkItem]) = {
    val (fit, spill) = items.partition(_.sizeBytes <= capBytes)
    val sorted = fit.sortBy(i => (i.sizeBytes, i.name))
    val batches = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[WorkItem]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[WorkItem]
    var curBytes = 0L
    sorted.foreach { it =>
      if (curBytes + it.sizeBytes > capBytes && cur.nonEmpty) {
        batches += cur; cur = scala.collection.mutable.ArrayBuffer.empty; curBytes = 0L
      }
      cur += it; curBytes += it.sizeBytes
    }
    if (cur.nonEmpty) batches += cur
    (batches.map(_.toSeq).toSeq, spill)
  }

  /** Format choice (migration.py:2136-2208): LOB-bearing tables go through
    * quoted text (+ per-row LOB files), old versions uncompressed, else
    * gzip text; our canonical binary interchange is parquet. Columns CSV
    * can't carry (arrays, binaries) force the binary path — the analog of
    * the reference's LOB branch. */
  def chooseFormat(hasLob: Boolean, compressedSupported: Boolean = true): Format =
    if (hasLob) PlainText
    else if (!compressedSupported) PlainText
    else GzipText

  def formatFor(schema: org.apache.spark.sql.types.StructType): Format = {
    import org.apache.spark.sql.types._
    val complex = schema.fields.exists(f => f.dataType match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => true
      case _ => false
    })
    if (complex) Binary else GzipText
  }

  /** Row count observed DURING the write (single input scan). The old
    * `df.count()` + write pair read every input row twice — at 100 TB that
    * doubles extraction cost. `Observation` rides the write job itself
    * (exact under task retries, unlike a bare accumulator tap) and blocks
    * only until that job finishes. */
  private def writeCounted(df: DataFrame, numFiles: Int)(
      write: DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs, count(lit(1)).as("rows")).repartition(numFiles))
    obs.get("rows").asInstanceOf[Long]
  }

  /** Binary-format extract (parquet) for tables with non-text-able columns. */
  def extractParquet(df: DataFrame, outDir: String, numFiles: Int = 8,
      table: String = ""): Long = {
    val cnt = writeCounted(df, numFiles)(
      _.write.mode(SaveMode.Overwrite).parquet(outDir))
    writeManifest(outDir, cnt, "parquet",
      df.sparkSession.sparkContext.hadoopConfiguration, df.schema.toDDL,
      table = table)
    cnt
  }

  /** S6: gzip CSV extract of one table directory, with a JSON manifest
    * (our replacement for the reference's `extractinfo`,
    * migration.py:1445-1458). Partition count bounds file count the way
    * Temp_Extract_Name1..8 did (migration.py:2382-2396). */
  def extractGzipCsv(df: DataFrame, outDir: String, numFiles: Int = 8,
      table: String = ""): Long = {
    val cnt = writeCounted(df, numFiles)(
      _.write.mode(SaveMode.Overwrite)
        .option("compression", "gzip")
        .option("header", "true")
        .option("timestampFormat", CsvTimestampFormat)
        .csv(outDir))
    writeManifest(outDir, cnt, "gzip_csv",
      df.sparkSession.sparkContext.hadoopConfiguration, df.schema.toDDL,
      table = table)
    cnt
  }

  /** S11 + O5: per-extract manifest with a completeness sentinel — replaces
    * the reference's `extractinfo` token scraping (migration.py:1445-1458)
    * and its last-line sentinel check (migration.py:1301-1310). Listing and
    * write go through the path's Hadoop FileSystem so the manifest lands
    * beside extracts on hdfs:///object-store dirs, not just file://. */
  def writeManifest(outDir: String, rows: Long, format: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration(),
      schemaDdl: String = "", table: String = "",
      lobFiles: Map[Int, Long] = Map.empty): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = dirPath.getFileSystem(conf)
    val files = fs.listStatus(dirPath)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map(s => s"""{"name":"${s.getPath.getName}","bytes":${s.getLen}}""")
    // `table` pins the manifest to ITS table: resume keys extract dirs by
    // positional table id, so an id remap (table set changed between runs
    // against one out dir) must not silently attribute this extract — and
    // its recorded row count — to a different table. `lob_files` records the
    // per-LOB-column file census so the load verify covers the LOB plane,
    // not just the scalar row count.
    val tableField = if (table.isEmpty) "" else s""""table":"${jsonEscape(table)}","""
    val lobField = if (lobFiles.isEmpty) "" else
      lobFiles.toSeq.sorted.map { case (c, n) => s""""$c":$n""" }
        .mkString(""""lob_files":{""", ",", "},")
    val json =
      s"""{$tableField$lobField"rows":$rows,"format":"$format","schema":"${jsonEscape(schemaDdl)}","files":[${files.mkString(",")}],"complete":true}"""
    // sibling file, not inside the dir: underscore-prefixed files are
    // invisible to Spark readers, and a non-underscore file inside the
    // directory would pollute the data scan
    val out = fs.create(new org.apache.hadoop.fs.Path(outDir + ".manifest.json"), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** LOB-table extract (the reference's forced per-row-file path for
    * LOB-bearing tables, migration.py:2115-2118, 2261-2296): scalar columns
    * go through the quoted-text plane (gzip CSV + manifest, format
    * `lob_csv`), and each BinaryType column becomes one file per non-null
    * cell under the sibling dir `<outDir>.lob<colId>` via [[LobSink]]. The
    * row-id analog is the table's LEAD column (SURVEY §7.4's documented
    * rowid deviation) and must cast to long. The manifest's schema DDL keeps
    * the FULL schema including the LOB columns, which is what lets
    * [[readExtractedAuto]] reassemble the table without the source. */
  def extractLob(df: DataFrame, outDir: String, tableId: Int, numFiles: Int = 8,
      table: String = ""): Long = {
    import org.apache.spark.sql.types.BinaryType
    val fields = df.schema.fields
    val idCol = fields.head.name
    // the lead column IS the per-row file name, so it must identify rows:
    // a null id would alias to row 0, a duplicate would overwrite its twin
    // (overwrite=true), and the count-only load verify would stay green over
    // the corrupted read-back — fail the extract instead. One column-pruned
    // aggregate over the cast the sink itself applies (covers null AND
    // non-castable values in one check). Negative ids are legal: the
    // read-back regexp accepts them.
    val idL = col(idCol).cast("long")
    val ids = df.agg(count(lit(1)).as("n"), count(idL).as("n_id"),
      countDistinct(idL).as("n_uniq")).head()
    require(ids.getLong(1) == ids.getLong(0) && ids.getLong(2) == ids.getLong(0),
      s"LOB extract needs a non-null, unique, long-castable lead column: " +
        s"'$idCol' has ${ids.getLong(0)} rows, ${ids.getLong(1)} usable ids, " +
        s"${ids.getLong(2)} distinct")
    val scalar = df.select(fields.filter(_.dataType != BinaryType).map(f => col(f.name)).toSeq: _*)
    val cnt = writeCounted(scalar, numFiles)(
      _.write.mode(SaveMode.Overwrite)
        .option("compression", "gzip")
        .option("header", "true")
        .option("timestampFormat", CsvTimestampFormat)
        .csv(outDir))
    val lobCounts = fields.zipWithIndex.collect {
      case (f, i) if f.dataType == BinaryType =>
        (i + 1) -> LobSink.writePerRow(df, idCol, f.name, s"$outDir.lob${i + 1}",
          tableId, colId = i + 1)
    }.toMap
    writeManifest(outDir, cnt, "lob_csv",
      df.sparkSession.sparkContext.hadoopConfiguration, df.schema.toDDL,
      table = table, lobFiles = lobCounts)
    cnt
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Read a manifest back; `complete` is the resume-safety sentinel. */
  def readManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.json(outDir + ".manifest.json")

  /** Reconstruct an extracted table purely from its on-disk artifacts: the
    * manifest declares the format and the schema DDL, so the LOAD phase
    * needs neither the source tables nor the catalog — the reference loads
    * `FROM Extracted_Data/<tid>/<file>` the same way
    * (`/root/reference/Migration/migration.py:1538-1556`, `load_table.sh:
    * 36-87`). A truncated or corrupted extract therefore reaches the load
    * verify as-is and fails it, instead of being papered over by a re-read
    * of the intact source. */
  def readExtractedAuto(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StructType}
    val m = readManifest(spark, dir).select("format", "schema").head()
    val schema = StructType.fromDDL(m.getString(1))
    m.getString(0) match {
      case "parquet" => spark.read.schema(schema).parquet(dir)
      case "gzip_csv" => readExtracted(spark, dir, schema)
      case "lob_csv" =>
        // scalar plane from the CSV, LOB columns re-joined from their
        // per-row files (file name carries the row id; a row with no file
        // had a NULL cell — left join restores it)
        val idName = schema.fields.head.name
        val mAll = readManifest(spark, dir)
        // LOB-plane completeness: the manifest's per-column file census must
        // match what's on disk — a lost LOB file would otherwise read back
        // as a silent NULL cell under a still-green scalar row count. Pure
        // FS-metadata listing, no job.
        val recordedLob: Map[Int, Long] =
          if (mAll.columns.contains("lob_files"))
            mAll.select(col("lob_files.*")).schema.fieldNames.zip(
              mAll.select(col("lob_files.*")).head().toSeq).map {
              case (k, v) => k.toInt -> v.asInstanceOf[Number].longValue()
            }.toMap
          else Map.empty
        val scalar = readExtracted(spark, dir,
          StructType(schema.fields.filter(_.dataType != BinaryType)))
        val full = schema.fields.zipWithIndex
          .collect { case (f, i) if f.dataType == BinaryType => (f, i + 1) }
          .foldLeft(scalar) { case (acc, (f, colId)) =>
            val lobDir = s"$dir.lob$colId"
            recordedLob.get(colId).foreach { expected =>
              val p = new org.apache.hadoop.fs.Path(lobDir)
              val actual = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                .listStatus(p).count(s => s.isFile && s.getPath.getName.contains("_row"))
              require(actual == expected,
                s"LOB plane incomplete for $lobDir: $actual files on disk, " +
                  s"manifest recorded $expected")
            }
            val lob = LobSink.readBack(spark, lobDir)
              .select(
                regexp_extract(col("file_name"), "_row(-?\\d+)\\.", 1)
                  .cast("long").as("__lob_id"),
                col("content").as(f.name))
            acc.join(lob, acc(idName).cast("long") === col("__lob_id"), "left_outer")
              .drop("__lob_id")
          }
        full.select(schema.fields.map(f => col(f.name)).toSeq: _*)
      case other => throw new IllegalArgumentException(s"unknown extract format: $other")
    }
  }

  /** Micro-precision timestamp format for the CSV interchange: the writer's
    * default keeps only milliseconds, which silently truncates micro-stamped
    * event data — an extract->load round-trip must be bit-faithful. */
  val CsvTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Read an extracted directory back with an explicit schema (no inference
    * in the engine proper — SURVEY §1.3). */
  def readExtracted(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", CsvTimestampFormat).csv(dir)

  /** Resume reconciliation (migration.py:1977,2675): work items not yet in
    * the extracted checkpoint — a left-anti join, never a driver loop. */
  def pendingWork(listed: DataFrame, extracted: DataFrame, key: String): DataFrame =
    listed.join(extracted, Seq(key), "left_anti")
}
