package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.Jdbc

/** S1/S16 live mode against embedded Derby (no server in the sandbox). */
class JdbcSpec extends SparkTestBase {

  private lazy val url =
    Jdbc.derbyUrl(java.nio.file.Files.createTempDirectory("graft_jdbc_spec").toString)

  test("JDBC write + read round-trips a table") {
    val supplier = Tables.load(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
    Jdbc.write(supplier, url, "supplier_live")
    val back = Jdbc.read(spark, url, "supplier_live")
    assert(back.count() == supplier.count())
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("s_name", "s_nationkey", "s_suppkey"))
    val a = supplier.orderBy("s_suppkey").collect().map(_.toSeq)
    val b = back.select("s_suppkey", "s_name", "s_nationkey")
      .orderBy("s_suppkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("partitioned JDBC read opens range partitions and matches the plain read") {
    val region = Tables.load(spark, sfDir, "region")
    Jdbc.write(region.select("r_regionkey", "r_name"), url, "region_live")
    val part = Jdbc.readPartitioned(spark, url, "region_live",
      "r_regionkey", lower = 0L, upper = 4L, numPartitions = 3)
    assert(part.rdd.getNumPartitions == 3, "bounds did not split the read")
    val plain = Jdbc.read(spark, url, "region_live")
    assert(part.orderBy("r_regionkey").collect().map(_.toSeq).toSeq ==
      plain.orderBy("r_regionkey").collect().map(_.toSeq).toSeq)
  }

  test("append mode accumulates; overwrite replaces (load semantics)") {
    val nation = Tables.load(spark, sfDir, "nation").select("n_nationkey", "n_name")
    Jdbc.write(nation, url, "nation_modes")
    Jdbc.write(nation, url, "nation_modes", SaveMode.Append)
    assert(Jdbc.read(spark, url, "nation_modes").count() == 2 * nation.count())
    Jdbc.write(nation, url, "nation_modes")
    assert(Jdbc.read(spark, url, "nation_modes").count() == nation.count())
  }
}
