package graft.rewrite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.core.{Catalog, Tables}

/** Schema serializer + replayer (SURVEY §2.1 S15-S17).
  *
  * The reference shells out to `iqunload` to produce `reload.sql`
  * (`/root/reference/Migration/migration.py:476-604`) and to `dbisql` to
  * replay it (`load_schema.sh:10-18`). Our engine's equivalents: `render`
  * serializes the live catalog into a reload.sql-shaped script (go-delimited,
  * FK DDL separated — the rewriter's exercise input), and `replay` executes
  * the DDL subset through `spark.sql` into the session catalog.
  */
object SchemaScript {

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "STRING"
    case TimestampType | TimestampNTZType => "TIMESTAMP_NTZ"
    case BinaryType => "BINARY"
    case ArrayType(el, _) => s"ARRAY<${sqlType(el)}>"
    case other => other.sql
  }

  /** Render the catalog as a go-delimited reload script (one CREATE TABLE
    * per table, plus a representative FK constraint statement). */
  def render(spark: SparkSession, sfDir: String): Seq[String] = {
    val creates = Catalog.tableMetas.flatMap { tm =>
      val schema = Tables.load(spark, sfDir, tm.tableName).schema
      val cols = schema.fields.map { f =>
        val nn = if (f.nullable) "" else " NOT NULL"
        s"""  "${f.name}" ${sqlType(f.dataType)}$nn"""
      }
      Seq(s"""CREATE TABLE "${tm.owner}"."${tm.tableName}" (""") ++
        cols.init.map(_ + ",") :+ cols.last :+ ")" :+ "go"
    }
    val fks = Seq(
      """ALTER TABLE "graft"."orders" ADD FOREIGN KEY "fk_o_cust" ("o_custkey")""",
      """  REFERENCES "graft"."customer" ("c_custkey")""",
      "go",
      """ALTER TABLE "graft"."lineitem" ADD FOREIGN KEY "fk_l_order" ("l_orderkey")""",
      """  REFERENCES "graft"."orders" ("o_orderkey")""",
      "go")
    creates ++ fks
  }

  /** Replay CREATE TABLE statements from (possibly rewritten) script lines
    * into the session catalog as empty managed tables under `dbName`.
    * Commented and FK statements are skipped — FK DDL is deferred by design
    * (migration.py:1153-1168). Returns the tables created. */
  def replay(spark: SparkSession, out: Seq[Rewriter.OutLine], dbName: String): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbName")
    val stmts = out.filter(l => !l.commented && !l.is_fk)
      .groupBy(_.stmt_id).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.line_no).map(_.text.trim).filterNot(_.equalsIgnoreCase("go"))
        .mkString(" "))
    val created = stmts.flatMap { stmt =>
      val m = """(?is)CREATE TABLE\s+"([^"]+)"\."([^"]+)"\s*\((.*)\)\s*""".r
        .findFirstMatchIn(stmt)
      m.map { g =>
        val table = g.group(2)
        val cols = g.group(3)
        spark.sql(s"""CREATE TABLE IF NOT EXISTS $dbName.$table (${cols.replace("\"", "`")})
                     | USING parquet""".stripMargin)
        table
      }
    }
    created
  }
}
