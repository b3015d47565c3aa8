package graft.rewrite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Closure

/** Catalog-driven artifact-rule assembly (C2's second half).
  *
  * The reference builds ~10³ comment rules from ~20 catalog queries before
  * the rewriter runs: dbo-owned objects (`/root/reference/Migration/
  * migration.py:646-729`), `_sap\_%`-owned objects (`731-813`, the
  * LIKE-ESCAPE owner pattern), their indexes/triggers/procedures, and the
  * TRANSITIVE view-dependency closure over SYSDEPENDENCY (`684-692,
  * 777-786`) so a view over a commented table — at any depth — is commented
  * too, plus a fixed list of `call dbo.sa_*` entries (`720-728`).
  *
  * Spark shape: each catalog query is a join over the SYSTABLE/SYSUSER/
  * SYSINDEX/SYSTRIGGER/SYSPROCEDURE/SYSDEPENDENCY mirrors, the multilevel
  * view walk is [[graft.core.Closure.transitiveClosure]] (path-doubling to a
  * fixpoint instead of the reference's one-edge-per-roundtrip cursor loop),
  * and the result is one relation (pattern, action, pat1, pat2) — collected
  * driver-side only to feed the rewriter's broadcast rule list (catalog-
  * sized control data, like the reference's in-memory artifact list).
  */
object RuleAssembly {

  /** `'_sap\_%' ESCAPE '\'` — leading `_` is a single-char wildcard, the
    * middle `\_` a literal underscore (migration.py:736); Column.like uses
    * `\` as its escape char, same machinery as p4_like_escape. */
  private def sapOwnerPred = lower(col("user_name")).like("_sap\\_%")

  private def rule(pattern: org.apache.spark.sql.Column, pat1: String, pat2: org.apache.spark.sql.Column) =
    struct(pattern.as("pattern"), lit("COMMENT").as("action"),
      lit(pat1).as("pat1"), pat2.as("pat2"))

  /** Assemble the rule relation from catalog mirrors.
    *
    * @param users    (user_id, user_name)
    * @param tables   (table_id, object_id, table_name, creator, table_type, server_type)
    * @param indexes  (index_name, table_id)
    * @param triggers (trigger_name, table_id)
    * @param procs    (proc_name, creator)
    * @param objects  (object_id, obj_name) — tables AND views
    * @param deps     (child, parent) — dependent object over referenced object
    * @return distinct (pattern, action, pat1, pat2), all strings,
    *         'NULL' placeholders like DB_Artifacts.list
    */
  def assemble(users: DataFrame, tables: DataFrame, indexes: DataFrame,
      triggers: DataFrame, procs: DataFrame, objects: DataFrame,
      deps: DataFrame): DataFrame = {

    def ownedRules(ownerPred: org.apache.spark.sql.Column): DataFrame = {
      val owned = tables.join(users, col("creator") === col("user_id"))
        .filter(ownerPred &&
          col("table_type") === "BASE" && col("server_type") === "IQ")

      // tables: (name, COMMENT, CREATE TABLE|CREATE procedure, owner)
      val tableRules = owned.select(explode(array(
        rule(col("table_name"), "CREATE TABLE", col("user_name")),
        rule(col("table_name"), "CREATE procedure", col("user_name")))).as("r"))

      // indexes on owned tables (migration.py:663-667)
      val idxRules = indexes.join(owned.select("table_id"), Seq("table_id"))
        .select(rule(col("index_name"), "CREATE", lit("INDEX")).as("r"))

      // triggers on owned tables (migration.py:669-675)
      val trgRules = triggers.join(owned.select("table_id"), Seq("table_id"))
        .select(explode(array(
          rule(col("trigger_name"), "CREATE TRIGGER", lit("NULL")),
          rule(col("trigger_name"), "COMMENT ON", lit("TRIGGER")),
          rule(col("trigger_name"), "COMMENT TO PRESERVE FORMAT ON", lit("TRIGGER")))).as("r"))

      // multilevel view dependents of owned tables (migration.py:677-698):
      // transitive closure over SYSDEPENDENCY, then name resolution
      val closure = Closure.transitiveClosure(deps)
      val viewNames = closure
        .join(owned.select(col("object_id").as("parent")), Seq("parent"))
        .select(col("child").as("object_id")).distinct()
        .join(objects, Seq("object_id"))
      val viewRules = viewNames.select(explode(array(
        rule(col("obj_name"), "CREATE VIEW", lit("NULL")),
        rule(col("obj_name"), "COMMENT ON", lit("VIEW")),
        rule(col("obj_name"), "COMMENT TO PRESERVE FORMAT ON", lit("VIEW")))).as("r"))

      tableRules.unionByName(idxRules).unionByName(trgRules).unionByName(viewRules)
    }

    // procedures/functions by owner (migration.py:700-709), sp_/sa_ excluded
    def ownedProcRules(ownerPred: org.apache.spark.sql.Column): DataFrame =
      procs.join(users, col("creator") === col("user_id"))
        .filter(ownerPred &&
          !col("proc_name").like("sp_%") && !col("proc_name").like("sa_%"))
        .select(explode(array(
          rule(col("proc_name"), "CREATE procedure", lit("NULL")),
          rule(col("proc_name"), "COMMENT ON", lit("Procedure")),
          rule(col("proc_name"), "COMMENT TO PRESERVE FORMAT ON", lit("Procedure")),
          rule(col("proc_name"), "CREATE FUNCTION", lit("NULL")))).as("r"))

    val isDbo = lower(col("user_name")) === "dbo"
    val isSap = sapOwnerPred

    // _sap_% users themselves are commented out as GRANT CONNECT entries
    // (migration.py:736-741)
    val sapUserRules = users.filter(isSap)
      .select(rule(col("user_name"), "GRANT CONNECT", lit("NULL")).as("r"))

    // fixed `call dbo.sa_*` list (migration.py:720-728)
    val spark = users.sparkSession
    import spark.implicits._
    val callRules = Seq(
      "sa_reset_identity", "sa_make_object", "sa_sync", "sa_sync_sub",
      "sa_internal_load_cost_model", "sa_internal_system_task",
      "sa_refresh_text_indexes", "sa_refresh_materialized_views")
      .toDF("p1")
      .select(struct(lit("call").as("pattern"), lit("COMMENT").as("action"),
        col("p1").as("pat1"), lit("dbo").as("pat2")).as("r"))

    ownedRules(isDbo).unionByName(ownedProcRules(isDbo))
      .unionByName(ownedRules(isSap)).unionByName(ownedProcRules(isSap))
      .unionByName(sapUserRules).unionByName(callRules)
      .select("r.pattern", "r.action", "r.pat1", "r.pat2")
      .distinct()
  }

  /** Rule relation over the deterministic catalog fixture. */
  def fixtureRelation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = CatalogFixture
    assemble(
      f.users.toDF("user_id", "user_name"),
      f.tables.toDF("table_id", "object_id", "table_name", "creator", "table_type", "server_type"),
      f.indexes.toDF("index_name", "table_id"),
      f.triggers.toDF("trigger_name", "table_id"),
      f.procs.toDF("proc_name", "creator"),
      f.objects.toDF("object_id", "obj_name"),
      f.deps.toDF("child", "parent"))
  }

  /** Collect an assembled relation into rewriter rules (catalog-sized
    * control data — driver-side by design, like the reference's list). */
  def toRules(relation: DataFrame): Seq[Rewriter.Rule] =
    relation.collect().toSeq.map { r =>
      Rewriter.Rule(
        r.getString(0),
        Option(r.getString(2)).filter(p => p != "NULL" && p.nonEmpty),
        Option(r.getString(3)).filter(p => p != "NULL" && p.nonEmpty),
        banner = s"catalog artifact: ${r.getString(0)}")
    }
}

/** Deterministic SYSTABLE/SYSUSER/SYSDEPENDENCY-shaped fixture — the
  * catalog a small IQ server with dbo/_sap_ content would present
  * (FIXTURES.md pattern: static Seqs so the DuckDB oracle replays the
  * identical VALUES literals).
  *
  * `xsap_ops` matches `'_sap\_%' ESCAPE '\'` via the leading single-char
  * wildcard; `sapling` does not (no underscore at position 4);
  * `audit_proxy` is dbo-owned but server_type='SA', excluded by the
  * reference's server_type='IQ' filter; `v_audit2` is only reachable
  * through the MULTILEVEL dependency v_audit2 → v_audit → audit_log.
  */
object CatalogFixture {
  // (user_id, user_name)
  val users: Seq[(Int, String)] = Seq(
    (1, "DBA"), (2, "dbo"), (101, "_sap_etl"), (102, "xsap_ops"),
    (103, "analyst"), (104, "sapling"))

  // (table_id, object_id, table_name, creator, table_type, server_type)
  val tables: Seq[(Int, Int, String, Int, String, String)] = Seq(
    (1, 101, "audit_log", 2, "BASE", "IQ"),
    (2, 102, "etl_stage", 101, "BASE", "IQ"),
    (3, 103, "ops_log", 102, "BASE", "IQ"),
    (4, 104, "orders", 1, "BASE", "IQ"),
    (5, 105, "audit_proxy", 2, "BASE", "SA"))

  // (index_name, table_id)
  val indexes: Seq[(String, Int)] = Seq(("ix_audit", 1), ("ix_orders", 4))

  // (trigger_name, table_id)
  val triggers: Seq[(String, Int)] = Seq(("trg_audit", 1))

  // (proc_name, creator): sp_helper excluded by the sp_% filter
  val procs: Seq[(String, Int)] = Seq(
    ("dbo_cleanup", 2), ("sp_helper", 2), ("sap_loader", 101))

  // (object_id, obj_name): tables and views share the object namespace
  val objects: Seq[(Int, String)] = Seq(
    (101, "audit_log"), (102, "etl_stage"), (103, "ops_log"),
    (104, "orders"), (105, "audit_proxy"),
    (201, "v_audit"), (202, "v_audit2"), (203, "v_etl"), (204, "v_orders"))

  // (child, parent): dependent object → referenced object
  val deps: Seq[(Int, Int)] = Seq(
    (201, 101), // v_audit → audit_log
    (202, 201), // v_audit2 → v_audit (multilevel)
    (203, 102), // v_etl → etl_stage
    (204, 104)) // v_orders → orders (DBA-owned: must NOT be commented)

  private def lit2(vs: Seq[(Int, String)], cols: String) =
    vs.map { case (a, b) => s"($a, '$b')" }.mkString("(VALUES ", ", ", s") AS t($cols)")

  def usersLiteral: String = lit2(users, "user_id, user_name")
  def objectsLiteral: String = lit2(objects, "object_id, obj_name")
  def indexesLiteral: String =
    indexes.map { case (n, t) => s"('$n', $t)" }
      .mkString("(VALUES ", ", ", ") AS t(index_name, table_id)")
  def triggersLiteral: String =
    triggers.map { case (n, t) => s"('$n', $t)" }
      .mkString("(VALUES ", ", ", ") AS t(trigger_name, table_id)")
  def procsLiteral: String =
    procs.map { case (n, c) => s"('$n', $c)" }
      .mkString("(VALUES ", ", ", ") AS t(proc_name, creator)")
  def tablesLiteral: String =
    tables.map { case (t, o, n, c, tt, st) => s"($t, $o, '$n', $c, '$tt', '$st')" }
      .mkString("(VALUES ", ", ",
        ") AS t(table_id, object_id, table_name, creator, table_type, server_type)")
  def depsLiteral: String =
    deps.map { case (c, p) => s"($c, $p)" }
      .mkString("(VALUES ", ", ", ") AS t(child, parent)")
}
