package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.{Catalog, Ctl, Engine, Tables}
import graft.extract.Extract
import graft.load.Loader
import graft.premigration.Checks
import graft.rewrite.{ReloadFixture, Rewriter}

/** CLI entry points with the reference's flag semantics (SURVEY §7.1 step 9):
  * the five phase flags are mutually exclusive with exactly one required —
  * `--onlyschema`/`--onlydata`/`--fullextraction` mirror the reference's
  * unload mode matrix (`/root/reference/Migration/migration.py:39-107`:
  * schema-only, data-only, or both), `--premigration`/`--fullload` the
  * other utilities. Resume prompts become idempotent non-interactive
  * reconciliation, and every phase leaves the same control files the
  * reference does (iq_tables.list, ExtractedTables.out,
  * HDL_LoadedTables.out).
  *
  * Usage: graft.cli.Main --premigration|--onlyschema|--onlydata|
  *                       --fullextraction|--fullload
  *                       [--sfdir DIR] [--out DIR] [--batchsize GB]
  */
object Main {

  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    // the reference's mutual-exclusion matrix (migration.py:103-107):
    // --onlyschema / --onlydata / --fullextraction are exclusive unload
    // modes; premigration and load are the other phases of the unified CLI
    val phases = flags.intersect(Set("--premigration", "--onlyschema",
      "--onlydata", "--fullextraction", "--fullload"))
    require(phases.size == 1,
      "exactly one of --premigration | --onlyschema | --onlydata | " +
        "--fullextraction | --fullload is required (they are mutually exclusive)")
    def opt(name: String, default: String): String =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }.getOrElse(default)
    val sfDir = opt("--sfdir", "/root/testdata/sf0.001")
    val out = opt("--out", Files.createTempDirectory("graft_run").toString)

    val spark = Engine.session("graft-cli")
    spark.sparkContext.setLogLevel("WARN")
    // the out dir is created through the SESSION's Hadoop configuration so
    // spark.hadoop.* settings (object-store credentials and the like) apply
    // to this mkdirs the same as to every later control-file write — a bare
    // new Configuration() would fail on an s3a:// out dir at the first step
    Ctl.mkdirs(spark.sparkContext.hadoopConfiguration, out)
    // batch size arrives in GB like the reference's Batch_Size_GB and goes
    // through the same config validation (0 = batching off, else >= 100)
    val batchGb = opt("--batchsize", "0").toInt
    val cfg = graft.core.Config.MigrationConfig("/", batchSizeGb = batchGb)
    // --jdbc <url> switches the data plane to the live server: extraction
    // phases inventory and read through the connection, the load phase
    // writes back through it (the "Spark SQL + JDBC" approach end-to-end)
    val jdbc = opt("--jdbc", "")
    val capBytes = cfg.batchSizeGb.toLong << 30
    try phases.head match {
      case "--premigration" => premigration(spark, sfDir, out, jdbc)
      case "--onlyschema" => onlySchema(spark, out)
      case "--onlydata" =>
        if (jdbc.nonEmpty) onlyDataJdbc(spark, jdbc, out, capBytes)
        else onlyData(spark, sfDir, out, capBytes)
      case "--fullextraction" =>
        if (jdbc.nonEmpty) { onlySchema(spark, out); onlyDataJdbc(spark, jdbc, out, capBytes) }
        else fullExtraction(spark, sfDir, out, capBytes)
      case "--fullload" =>
        if (jdbc.nonEmpty) fullLoadJdbc(spark, out, jdbc) else fullLoad(spark, out)
    } finally spark.stop()
  }

  def premigration(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, out: String, jdbc: String = ""): Unit = {
    // environment gates first (migration.py:316-414 runs them before any
    // phase): simplex local engine, forced write mode like the reference's
    // `--mode w` since sandbox fixtures are not a readonly server. The
    // write probe matches the mode: live --jdbc probes by CREATE/DROP of a
    // real test table through the connection (migration.py:385-414); the
    // fixture mode checks source-dir writability (no side effects).
    val gates = graft.premigration.Gates.evaluate(spark,
      props = Map("version" -> s"graft/spark ${spark.version}",
        "readonly" -> "Off"),
      nodes = Seq.empty, connectedServer = "local",
      probeWriteSucceeds =
        if (jdbc.nonEmpty) () => graft.sources.Jdbc.probeWrite(jdbc)
        else () => Files.isWritable(Paths.get(sfDir)),
      forceWriteMode = true).collect()
    require(gates.forall(_.getBoolean(1)), "environment gates failed")
    val gateReport = gates.map(r =>
      f"gate:${r.getString(0)}%-22s pass=${r.getBoolean(1)}  ${r.getString(2)}")
    val findings = Checks.findings(spark, sfDir).collect()
    val report = (gateReport ++ findings.map(r =>
      f"${r.getString(0)}%-28s ${r.getLong(1)}%8d  actionRequired=${r.getBoolean(2)}"))
      .mkString("# graft pre-migration report\n", "\n", "\n")
    Ctl.write(spark.sparkContext.hadoopConfiguration,
      s"$out/pre_migration.out", report)
  }

  /** Schema unload only (`--onlyschema y`, migration.py:237-238): rewrite
    * the reload script, splitting FK DDL out. */
  def onlySchema(spark: org.apache.spark.sql.SparkSession, out: String): Unit = {
    val rewritten = Rewriter.rewrite(spark, ReloadFixture.lines).collect().toSeq
    val (main, fk) = Rewriter.serialize(rewritten)
    val conf = spark.sparkContext.hadoopConfiguration
    Ctl.write(conf, s"$out/AutoUpdated_Reload.sql", main)
    Ctl.write(conf, s"$out/Foreign_Key_Constraint.sql", fk)
  }

  /** Both unloads (`--fullextraction y`, migration.py:241). */
  def fullExtraction(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, out: String, batchCapBytes: Long = 0L): Unit = {
    onlySchema(spark, out)
    onlyData(spark, sfDir, out, batchCapBytes)
  }

  /** Data unload only (`--onlydata y`, migration.py:239-240):
    * inventory → work list → resume-aware extract. */
  def onlyData(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, out: String, batchCapBytes: Long = 0L): Unit =
    onlyDataFrom(spark, out, batchCapBytes,
      Catalog.tableInventory(spark, sfDir).collect().toSeq.map(r =>
        Extract.WorkItem(r.getString(0).split('.').last,
          r.getLong(1), r.getLong(2), r.getInt(3))),
      n => Tables.load(spark, sfDir, n))

  /** Data unload against a LIVE server (`--onlydata --jdbc <url>`): the
    * inventory comes from the connection's catalog metadata (the S1 analog
    * of the reference's SYSTABLE scan over pyodbc, migration.py:1691) and
    * every table leaves through `spark.read.jdbc`. */
  def onlyDataJdbc(spark: org.apache.spark.sql.SparkSession,
      url: String, out: String, batchCapBytes: Long = 0L): Unit =
    onlyDataFrom(spark, out, batchCapBytes, jdbcWorkItems(spark, url),
      // range-partitioned parallel connections per table where an integral
      // key exists — a one-connection funnel is the thing that does NOT
      // survive a large table leaving a server
      n => graft.sources.Jdbc.readAuto(spark, url, n,
        numPartitions = spark.sparkContext.defaultParallelism.min(32)))

  /** Live-catalog inventory: table list from JDBC metadata, row counts
    * through the DSv2 catalog relation so Catalyst PUSHES the COUNT(*)
    * into the remote scan (`PushedAggregates` — the server computes it,
    * one row crosses the wire; the reference's SYSTABLE-joined counts at
    * migration.py:1699,1704 are this shape). Falls back to the v1
    * derived-table count when a dialect declines aggregate pushdown —
    * still server-side, never a full-table drag. One row per TABLE —
    * driver-side assembly stays catalog-sized, never data-sized.
    *
    * Row widths: when the server carries a SYSCOLUMN-shaped width catalog
    * (`widthCatalog` — columns `table_name`, `width`, one row per column,
    * like the reference's `SYS.SYSCOLUMN` sizing at migration.py:1704-1706),
    * per-table widths come from ONE pushed grouped `SUM(width) GROUP BY
    * table_name` (`Jdbc.pushedGroupedSum`, derived-table `Jdbc.groupedSum`
    * fallback) instead of the reference's per-table filtered re-query.
    * Tables absent from the catalog — and the default no-catalog mode —
    * size from the client-visible schema widths. */
  def jdbcWorkItems(spark: org.apache.spark.sql.SparkSession,
      url: String, widthCatalog: Option[String] = None): Seq[Extract.WorkItem] = {
    val catWidths: Map[String, Long] = widthCatalog.map { wc =>
      val viaV2 =
        try graft.sources.Jdbc.pushedGroupedSum(
          graft.sources.Jdbc.readV2(spark, url, wc), "table_name", "width")
        catch { case _: Throwable => None }
      viaV2.getOrElse(
          graft.sources.Jdbc.groupedSum(spark, url, wc, "table_name", "width"))
        .map { case (t, w) => t.toLowerCase -> w }.toMap
    }.getOrElse(Map.empty)
    graft.sources.Jdbc.listTablesQualified(url).sortBy(_._2)
      .zipWithIndex.map { case ((schem, n), i) =>
        val v2 = graft.sources.Jdbc.readV2(spark, url,
          if (schem.nonEmpty) s"$schem.$n" else n)
        val cnt = graft.sources.Jdbc.pushedCount(v2)
          .getOrElse(graft.sources.Jdbc.count(spark, url, n))
        val width = catWidths.getOrElse(n.toLowerCase,
          Catalog.rowWidth(v2.schema).toLong)
        Extract.WorkItem(n.toLowerCase, cnt, cnt * width, 2000 + i)
      }
  }

  private def onlyDataFrom(spark: org.apache.spark.sql.SparkSession,
      out: String, batchCapBytes: Long,
      workList: Seq[Extract.WorkItem],
      loadTable: String => org.apache.spark.sql.DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def ctlLine(w: Extract.WorkItem) =
      s"graft.${w.name},${w.rowCount},${w.sizeBytes},${w.tableId},N"
    Ctl.write(conf, s"$out/iq_tables.list",
      workList.map(ctlLine).mkString("", "\n", "\n"))
    // batch mode (migration.py:1758-1784): size-capped batches written as
    // iq_tables_Batch_<n>.list (1-based, the reference's naming); tables
    // individually over the cap spill to no_extraction.list and are NOT
    // extracted. Invariant (verify_batches_generated_iq_file,
    // migration.py:1817-1846): batch lines + spill lines == iq_tables lines.
    // stale batch artifacts from a previous run into the same out dir would
    // break the batches+spill==iq_tables invariant below (a re-run with a
    // different cap writes fewer files and leaves the old tail behind) —
    // clear them unconditionally, batching on or off
    Ctl.listFileNames(conf, out)
      .filter(n => n.matches("iq_tables_Batch_\\d+\\.list") ||
        n == "no_extraction.list")
      .foreach(n => Ctl.delete(conf, s"$out/$n"))
    val toExtract: Seq[Extract.WorkItem] =
      if (batchCapBytes > 0) {
        val (batches, spilled) = Extract.batch(workList, batchCapBytes)
        batches.zipWithIndex.foreach { case (b, i) =>
          Ctl.write(conf, s"$out/iq_tables_Batch_${i + 1}.list",
            b.map(ctlLine).mkString("", "\n", "\n"))
        }
        if (spilled.nonEmpty)
          Ctl.write(conf, s"$out/no_extraction.list",
            spilled.map(ctlLine).mkString("", "\n", "\n"))
        require(batches.map(_.size).sum + spilled.size == workList.length,
          "batch partition lost tables (batches + no_extraction != iq_tables)")
        batches.flatten
      } else workList
    val done = toExtract.filter(_.rowCount > 0).map { w =>
      val df = loadTable(w.name)
      val dir = s"$out/Extracted_Data/${w.tableId}"
      // resume (migration.py:1940-2002): a complete manifest means this
      // table's extract already finished — skip it, idempotently. The rows
      // carried into ExtractedTables.out come from the MANIFEST (what was
      // actually written), never from the current inventory count: a resumed
      // run re-recording the source count would let the load verify compare
      // source-to-source and mask an extract-phase loss. The manifest must
      // also NAME this table: extract dirs are keyed by positional table id,
      // so a changed table set between runs remaps ids — a name mismatch
      // (or a legacy manifest with no name) re-extracts instead of silently
      // attributing another table's artifacts and count to this one.
      val recorded: Option[Long] =
        if (Ctl.exists(conf, dir + ".manifest.json")) {
          val mdf = Extract.readManifest(spark, dir)
          if (!mdf.columns.contains("table")) None
          else {
            val m = mdf.select(col("complete"), col("rows"), col("table")).head()
            if (m.getBoolean(0) && m.getString(2) == w.name) Some(m.getLong(1))
            else None
          }
        } else None
      // format planner (migration.py:2115-2208): LOB-bearing tables are
      // FORCED onto the per-row-file path (scalar CSV + one file per LOB
      // cell); other CSV-incompatible columns (arrays/structs) → parquet;
      // plain scalar tables → gzip text
      val hasLob = df.schema.fields.exists(
        _.dataType == org.apache.spark.sql.types.BinaryType)
      val rows = recorded.getOrElse {
        if (hasLob) Extract.extractLob(df, dir, w.tableId, table = w.name)
        else Extract.formatFor(df.schema) match {
          case Extract.Binary => Extract.extractParquet(df, dir, table = w.name)
          case _ => Extract.extractGzipCsv(df, dir, table = w.name)
        }
      }
      s"graft.${w.name},${w.tableId},$rows"
    }
    val empties = toExtract.filter(_.rowCount == 0)
      .map(w => s"graft.${w.name},${w.tableId},0")
    Ctl.write(conf, s"$out/ExtractedTables.out",
      (done ++ empties).mkString("", "\n", "\n"))
  }

  def fullLoad(spark: org.apache.spark.sql.SparkSession, out: String): Unit =
    fullLoadWith(spark, out, (work, failedPath, loadedOk) =>
      Loader.loadAll(work, s"$out/warehouse", failedPath, loadedOk,
        spark.sparkContext.hadoopConfiguration))

  /** Load back into a LIVE server (`--fullload --jdbc <url>`): same control
    * files and retry ordering, per-table loads through the JDBC
    * stage→verify→promote. */
  def fullLoadJdbc(spark: org.apache.spark.sql.SparkSession,
      out: String, url: String): Unit =
    fullLoadWith(spark, out, (work, failedPath, loadedOk) =>
      Loader.loadAllWith(work, failedPath, loadedOk,
        w => Loader.loadVerifiedJdbc(spark, w.df(), w.expected(), url, w.name),
        spark.sparkContext.hadoopConfiguration))

  private def fullLoadWith(spark: org.apache.spark.sql.SparkSession, out: String,
      runLoads: (Seq[Loader.LoadWork], String, Set[String]) => Seq[Loader.LoadResult]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // resume reconciliation (load_schema_and_data.py:776-874): previously
    // ok-loaded tables are skipped, previously FAILED tables retry FIRST
    val loadedPath = s"$out/HDL_LoadedTables.out"
    val loadedOk: Set[String] =
      if (Ctl.exists(conf, loadedPath))
        Ctl.readLines(conf, loadedPath)
          .filter(_.endsWith(",Y")).map(_.split(',')(0).stripPrefix("graft.")).toSet
      else Set.empty
    // expected counts come from the extract phase's control file, NOT a
    // source recount (load_schema_and_data.py:709-735), and the DATA comes
    // from the extract artifacts themselves: the load phase never touches
    // the source tables, exactly like the reference's `LOAD TABLE … FROM
    // Extracted_Data/<tid>/<file>` (migration.py:1538-1556,
    // load_table.sh:36-87). Verifying extract-written bytes against the
    // extract-recorded count means a truncated extract FILE fails here.
    val ctl = s"$out/ExtractedTables.out"
    require(Ctl.exists(conf, ctl),
      "--fullload requires ExtractedTables.out from a prior --fullextraction")
    val counts = Loader.extractedCounts(Ctl.readLines(conf, ctl))
    // empty tables were short-circuited by the extract (migration.py:
    // 1921-1931) — no files exist, so there is nothing to load; record Y
    val (loadable, empties) = counts.partition { case (_, tid, rows) =>
      rows > 0 || Ctl.exists(conf, s"$out/Extracted_Data/$tid.manifest.json")
    }
    val work = loadable.map { case (n, tid, cnt) =>
      Loader.LoadWork(n,
        () => Extract.readExtractedAuto(spark, s"$out/Extracted_Data/$tid"),
        () => cnt)
    }
    val results = runLoads(work, s"$out/HDL_FailedTables.out", loadedOk)
    val doneNames = results.map(_.tableName).toSet ++ empties.map(_._1)
    val keptOk = loadedOk.filterNot(doneNames).map(n => s"graft.$n,-,Y")
    Ctl.write(conf, loadedPath,
      (results.map(r => s"graft.${r.tableName},${r.loaded},${if (r.ok) "Y" else "N"}")
        ++ empties.filterNot(e => loadedOk.contains(e._1)).map(e => s"graft.${e._1},0,Y")
        ++ keptOk).mkString("", "\n", "\n"))
    require(results.forall(_.ok), "load verification failed for some tables")
  }
}
