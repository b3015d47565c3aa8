package graft.queries

import java.io.File

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Closure, QueryDef, Tables}
import graft.extract.LobSink

/** Remaining source/sink forms (SURVEY §2.1 S8-S10) and the transitive
  * dependency closure (§7.2), each exercised end-to-end with an oracle.
  */
object Sources {

  val defs: Seq[QueryDef] = Seq(

    // S8: quoted/escaped text sink for LOB-bearing tables
    // (migration.py:2143-2150) — write quoteAll CSV, read back, prove
    // byte-faithful round-trip by matching every row to the source.
    QueryDef(
      "s8_quoted_text_roundtrip",
      "SELECT count(*) AS n_rows, count(*) AS n_matched FROM documents") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val out = java.nio.file.Files.createTempDirectory("graft_s8").toString
      docs.write.mode(SaveMode.Overwrite)
        .option("header", "true").option("quoteAll", "true").option("escape", "\"")
        .csv(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val back = s.read.schema(schema)
        .option("header", "true").option("escape", "\"").option("multiLine", "true")
        .csv(out)
      docs.as("a").join(back.as("b"), col("a.doc_id") === col("b.doc_id"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("a.text") === col("b.text"), 1L).otherwise(0L)).as("n_matched"))
    },

    // S1/S16 live mode: JDBC sink + partitioned JDBC source round-trip
    // through embedded Derby (the sandbox's stand-in for a live server).
    // Oracle is the source table itself — equality proves the round-trip.
    QueryDef(
      "s2_jdbc",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      import graft.sources.Jdbc
      val url = Jdbc.derbyUrl(
        java.nio.file.Files.createTempDirectory("graft_jdbc").toString)
      val nation = Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      Jdbc.write(nation, url, "nation_live")
      Jdbc.readPartitioned(s, url, "nation_live",
          "n_nationkey", lower = 0L, upper = 24L, numPartitions = 4)
        .orderBy("n_nationkey")
    },

    // S9: per-row LOB file sink + binaryFile read-back
    // (migration.py:2262-2296): one file per payload, byte totals preserved.
    QueryDef(
      "s9_lob_roundtrip",
      """SELECT count(*) AS n_files, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val out = java.nio.file.Files.createTempDirectory("graft_s9").toString
      LobSink.writePerRow(media, "doc_id", "payload", out, tableId = 1008, colId = 2)
      LobSink.readBack(s, out)
        .agg(count(lit(1)).as("n_files"), sum(col("length")).as("total_bytes"))
    },

    // S10: sized multi-file sink (Temp_Extract_Size1..8,
    // migration.py:2382-2396): bound records per file, file count follows.
    QueryDef(
      "s10_sized_files",
      """SELECT count(*) AS n_rows, CAST(ceil(count(*) / 1000.0) AS BIGINT) AS n_files
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_linenumber")
      val out = java.nio.file.Files.createTempDirectory("graft_s10").toString
      li.repartition(1).write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", 1000).parquet(out)
      val nFiles = Option(new File(out).listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-"))
      val nRows = s.read.parquet(out).count()
      Seq((nRows, nFiles.toLong)).toDF("n_rows", "n_files")
    },

    // spark.sql text surface: the same ANSI SQL string runs on both engines
    // (registered temp views play the server's catalog role — S1/S2 via SQL).
    QueryDef(
      "sql1_text_query",
      """SELECT r_name, n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_acctbal > 0.0
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_cust
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE c_acctbal > 0.0
          |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
    },

    // §1.2 identity surrogate: dense ids over a deterministic ordering.
    QueryDef(
      "id1_identity_assign",
      """SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS row_id, n_name
        |FROM nation ORDER BY row_id""".stripMargin) { (s, dir) =>
      val nation = Tables.load(s, dir, "nation")
        .orderBy("n_nationkey").select("n_name")
      graft.core.Identity.assign(nation, "row_id")
        .select("row_id", "n_name")
        .orderBy("row_id")
    },

    // §7.2: transitive closure over a derived dependency tree
    // (child = p_partkey, parent = p_partkey div 2) via iterative
    // path-doubling self-joins; oracle is DuckDB's recursive CTE.
    QueryDef(
      "tc1_transitive_closure",
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part WHERE p_partkey > 1),
        |cl AS (
        |  SELECT child, parent FROM e
        |  UNION
        |  SELECT cl.child, e.parent FROM cl JOIN e ON cl.parent = e.child)
        |SELECT child, parent AS ancestor FROM cl ORDER BY child, ancestor""".stripMargin) {
      (s, dir) =>
      val edges = Tables.load(s, dir, "part")
        .filter(col("p_partkey") > 1)
        .select(col("p_partkey").as("child"), expr("p_partkey div 2").as("parent"))
      Closure.transitiveClosure(edges)
        .select(col("child"), col("parent").as("ancestor"))
        .orderBy("child", "ancestor")
    }
  )
}
