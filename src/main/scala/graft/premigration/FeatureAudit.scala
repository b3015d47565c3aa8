package graft.premigration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's full pre-migration feature audit (SURVEY §3.1):
  * `feature_properties` dispatches ~21 catalog checks, each appending
  * `(feature, comment)` to an informational or an action-required list
  * (`/root/reference/Pre_Migration/pre_migration.py:856-905` dispatch;
  * individual checks at pre_migration.py:96-757). Here each check is a
  * relational query over a deterministic SYS-catalog mirror
  * ([[FeatureCatalogFixture]], the `RuleAssembly.CatalogFixture` style), so
  * the whole audit is one DataFrame the DuckDB oracle replays literally.
  *
  * Catalog mirrors are fixture-sized control data; the scaling work in a
  * real audit is the table census, which lives in [[Checks]] / `Catalog`.
  */
object FeatureAudit {

  /** Supported remote-server classes (pre_migration.py:315). */
  val SupportedServerClasses: Seq[String] = Seq("aseodbc", "hanaodbc", "iqodbc", "saodbc")

  /** System users excluded from the SQLA-table check (pre_migration.py:438). */
  val SystemUsers: Seq[String] = Seq("SYS", "rs_systabgroup", "SA_DEBUG", "dbo")

  /** The audit relation: (feature, action_required, comment), one row per
    * triggered finding, in the reference's per-check append semantics
    * (per-ROW appends for the sysserver and MPX-option checks, per-COUNT
    * for the rest). Sorted for the oracle hash-compare. */
  def findings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = FeatureCatalogFixture

    val dbsp = f.dbspaces.toDF("dbspace_name", "dbspace_type")
    val iqt = f.iqTables.toDF("table_id", "is_rlv")
    val srv = f.servers.toDF("srvname", "srvclass")
    val pr = f.procs.toDF("proc_name", "proc_defn")
    val usr = f.users.toDF("user_name")
    val cert = f.certificates.toDF("cert_name")
    val xenv = f.externalEnvs.toDF("env_name")
    val xobj = f.externalEnvObjs.toDF("obj_name")
    val sprs = f.spatialRefs.toDF("srs_id", "srs_name")
    val tb = f.tables.toDF("table_name", "user_name", "table_type", "server_type")
    val ix = f.indexes.toDF("index_name", "index_type")
    val iqf = f.iqFiles.toDF("file_name", "segment_type")
    val ls = f.logicalServers.toDF("ls_name", "ls_id")
    val opt = f.options.toDF("option", "setting")
    val mpx = f.mpxNodes.toDF("server_name", "role")
    val chk = f.checkOptions.toDF("option_name", "option_type", "opt_user")
    val props = Seq((f.properties("version"), f.properties("Encryption"),
      f.properties("MaxConnections"))).toDF("version", "encryption", "max_connections")

    /** count-gated finding: emit iff the counting relation is non-empty. */
    def ifAny(rel: DataFrame)(feature: String, action: Boolean, comment: String): DataFrame =
      rel.agg(count(lit(1)).as("n")).filter(col("n") > 0)
        .select(lit(feature).as("feature"), lit(action).as("action_required"),
          lit(comment).as("comment"))

    val checks: Seq[DataFrame] = Seq(
      // 1. dbspace_verify (pre_migration.py:96-111): >1 MAIN dbspace
      dbsp.filter(col("dbspace_type") === "MAIN").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select(lit("Multiple_DBSpaces").as("feature"), lit(false).as("action_required"),
          lit("To be merged into one dbspace.").as("comment")),
      // 2. rlv_verify (234-252): RLV tables OR an RLV dbspace
      iqt.filter(col("is_rlv") === "T").agg(count(lit(1)).as("nt"))
        .crossJoin(dbsp.filter(col("dbspace_type") === "RLV").agg(count(lit(1)).as("nd")))
        .filter(col("nt") =!= 0 || col("nd") =!= 0)
        .select(lit("RLV_Support").as("feature"), lit(true).as("action_required"),
          lit("RLV is not supported in the target engine.").as("comment")),
      // 3. verify_iq_version (254-274): @@version must match 16.1
      ifAny(props.filter(!col("version").rlike("16.1")))(
        "Current_IQ_Version not 16.1", action = true,
        "Upgrade required as parallelization in extraction is not supported in below IQ versions."),
      // 4. verify_encryptiondb (294-309): db_property(Encryption) != None
      ifAny(props.filter(col("encryption") =!= "None"))(
        "DB_Encryption Enabled", action = false,
        "On-prem encryption key will not work in the target engine."),
      // 5. verify_sap_supported_remote_services (311-328): PER-ROW appends
      srv.filter(!col("srvclass").isin(SupportedServerClasses: _*))
        .select(lit("Non-SAP remote source").as("feature"), lit(false).as("action_required"),
          lit("Target engine does not have access to clients for non-SAP data sources.").as("comment")),
      srv.filter(col("srvclass").isin(SupportedServerClasses: _*))
        .select(lit("SAP remote source").as("feature"), lit(true).as("action_required"),
          lit("Automated migration of SAP(ASE, HANA, IQ, SQL Anywhere) remote sources is not supported.").as("comment")),
      // 6. external_udf_verify (330-344)
      ifAny(pr.filter(col("proc_defn").like("%external name%")))(
        "External_UDF", action = true,
        "External UDFs not supported in the target engine."),
      // 7. username_verify (346-364): reserved names + DBA, two findings
      ifAny(usr.filter(col("user_name").isin("saptu", "sapsupport", "custadmin", "hdladmin")))(
        "Reserved_User_Names", action = false,
        "Reserved usernames(saptu, sapsupport, custadmin, hdladmin) to be deleted/renamed."),
      ifAny(usr.filter(col("user_name") === "DBA"))(
        "DBA_user", action = false, "To be replaced by hdladmin."),
      // 8. certificates_verify (367-381)
      ifAny(cert)("Certificates", action = false,
        "Security certificates to be deleted as not supported in the target engine."),
      // 9. externalenv_verify (384-397)
      ifAny(xenv)("External_Environment", action = true,
        "External Environment not supported in the target engine."),
      // 10. externalenvobj_verify (400-413)
      ifAny(xobj)("External_Environment_Objects", action = true,
        "External Environment Objects not supported in the target engine."),
      // 11. spatialunit_verify (416-429)
      ifAny(sprs)("Spatial_Unit_Of_Measure", action = true,
        "Geospatial features not supported in the target engine."),
      // 12. sa_tables_verify (432-445): non-system SA-store base tables
      ifAny(tb.filter(!col("user_name").isin(SystemUsers: _*) &&
          col("table_type") === "BASE" && col("server_type") === "SA"))(
        "SQLA_Tables", action = true,
        "SQLA catalog tables not supported in the target engine."),
      // 13. lfindex_verify (464-478)
      ifAny(ix.filter(col("index_type") === "LF"))(
        "LF_INDEXES", action = false,
        "LF indexes are considered obsolete; default FP indexes recommended."),
      // 14. hngindex_verify (481-494)
      ifAny(ix.filter(col("index_type") === "HNG"))(
        "HNG_INDEXES", action = false,
        "HNG indexes are considered obsolete; default FP indexes recommended."),
      // 15. localitem_verify (497-510)
      ifAny(iqf.filter(col("segment_type") === "Local"))(
        "LOCAL_DBFILES", action = false, "To be merged into one dbspace."),
      // 16. logicalserver_verify (513-526): user-defined logical servers
      ifAny(ls.filter(col("ls_id") > 10000))(
        "Logical_Servers", action = true,
        "Logical servers not supported in the target engine."),
      // 17. dqpenable_verify (529-542)
      ifAny(opt.filter(col("option").like("DQP_Enabled%") && col("setting") === "ON"))(
        "DQP_Enabled", action = false, "Not supported in the target engine."),
      // 18. sharedtemp_verify (545-559)
      ifAny(dbsp.filter(col("dbspace_name") === "IQ_SHARED_TEMP"))(
        "IQ_SHARED_TEMP", action = false, "Not supported in the target engine."),
      // 19. webservice_verify (617-631)
      ifAny(f.webServices.toDF("ws_name"))(
        "Web_Services", action = false,
        "Web services not supported in the target engine."),
      // 20. verify_readers_present (726-740)
      ifAny(mpx.filter(col("role") === "reader"))(
        "MPX_Readers_Present", action = false,
        "All target worker nodes are provisioned as writer nodes."),
      // 21. verify_startup_options (743-757): unconditional informational
      // row keyed off db_property(MaxConnections)
      ifAny(props.filter(col("max_connections").isNotNull))(
        "StartupOptions", action = false,
        "Target startup options are set based on node t-shirt size."),
      // feature_properties tail (580-615): MPX option scans, PER-ROW
      chk.filter(col("option_name").like("MPX_options%") && col("opt_user") === "PUBLIC")
        .select(lit("MPX_options").as("feature"), lit(false).as("action_required"),
          lit("MPX options not supported in the target engine.").as("comment")),
      chk.filter(col("option_name").like("MPX_test_options%") && col("opt_user") === "PUBLIC")
        .select(lit("MPX_test_options").as("feature"), lit(false).as("action_required"),
          lit("MPX test options not supported in the target engine.").as("comment")),
      // tempextractdir_verify (601-615)
      ifAny(opt.filter(col("option").like("Temp_Extract_Directory%") && col("setting") =!= ""))(
        "Temp_Extract_Directory", action = false,
        "Reset required: must be an object store path in the target engine."))

    checks.reduce(_.unionByName(_)).orderBy("feature", "comment")
  }
}

/** Deterministic SYS-catalog mirror for the feature audit — every relation
  * the reference's 21 dispatched checks consult, shaped as in
  * pre_migration.py, with at least one triggering and one non-triggering
  * row per check so the fixture exercises both branches. VALUES-literal
  * builders let the DuckDB oracle replay the identical data. */
object FeatureCatalogFixture {

  // sp_iqdbspace(): (DBSpaceName, DBSpaceType) — 2 MAIN (trigger), a
  // SHARED_TEMP (trigger) and an RLV store (trigger)
  val dbspaces: Seq[(String, String)] = Seq(
    ("IQ_SYSTEM_MAIN", "MAIN"), ("iq_user_main", "MAIN"),
    ("IQ_SYSTEM_TEMP", "TEMPORARY"), ("IQ_SHARED_TEMP", "SHARED_TEMP"),
    ("rlv_store", "RLV"))

  // SYSTABLE ⋈ SYSIQTAB: (table_id, is_rlv)
  val iqTables: Seq[(Int, String)] = Seq((1, "F"), (2, "T"), (3, "F"))

  // db_property() results: a pre-16.1 version (trigger) + AES encryption
  // (trigger) + MaxConnections for the startup-options row
  val properties: Map[String, String] = Map(
    "version" -> "SAP IQ/16.0.110.3141",
    "Encryption" -> "AES",
    "MaxConnections" -> "100")

  // SYSSERVER: one SAP class (action finding), one non-SAP (info finding)
  val servers: Seq[(String, String)] = Seq(
    ("HANA_RS", "hanaodbc"), ("MYSQL_RS", "mysqlodbc"))

  // SYSPROCEDURE: one external-name UDF (trigger), one plain proc
  val procs: Seq[(String, String)] = Seq(
    ("py_udf", "create procedure py_udf() external name libudf"),
    ("sp_report", "create procedure sp_report() begin select 1 end"))

  // SYSUSER: DBA + one reserved name (both username findings trigger)
  val users: Seq[String] = Seq("DBA", "saptu", "analyst")

  val certificates: Seq[String] = Seq("cert_backup")
  val externalEnvs: Seq[String] = Seq("java")
  val externalEnvObjs: Seq[String] = Seq("JavaHelperClass")
  val spatialRefs: Seq[(Int, String)] = Seq((4326, "WGS 84"))

  // SYSTABLE ⋈ SYSUSER: (table_name, user_name, table_type, server_type) —
  // one customer SA table (trigger), one IQ table, one SYS-owned SA table
  // (excluded by the system-user filter)
  val tables: Seq[(String, String, String, String)] = Seq(
    ("sa_config", "custuser", "BASE", "SA"),
    ("orders", "DBA", "BASE", "IQ"),
    ("sysusage", "SYS", "BASE", "SA"))

  // SYSINDEX: LF + HNG trigger; FP is the recommended default
  val indexes: Seq[(String, String)] = Seq(
    ("ix_lf", "LF"), ("ix_hng", "HNG"), ("ix_fp", "FP"))

  // SYSIQFILE: (file_name, segment_type)
  val iqFiles: Seq[(String, String)] = Seq(
    ("main1.iq", "Main"), ("local1.iq", "Local"))

  // SYSIQLOGICALSERVER: built-ins have ls_id <= 10000
  val logicalServers: Seq[(String, Int)] = Seq(("AUTO", 2), ("ls_prod", 10001))

  // SYSOPTION: (option, setting)
  val options: Seq[(String, String)] = Seq(
    ("DQP_Enabled", "ON"),
    ("Temp_Extract_Directory", "/iq/tmp_extract"),
    ("Blocking", "ON"))

  // sp_iqmpxinfo(): (server_name, role) — a reader triggers
  val mpxNodes: Seq[(String, String)] = Seq(
    ("coord1", "coordinator"), ("w1", "writer"), ("r1", "reader"))

  // sp_iqcheckoptions(): (option_name, option_type, user_name)
  val checkOptions: Seq[(String, String, String)] = Seq(
    ("MPX_options_heartbeat_frequency", "Permanent", "PUBLIC"),
    ("MPX_test_options_dqp_threads", "Permanent", "PUBLIC"),
    ("Append_Load", "Permanent", "PUBLIC"))

  // SYSWEBSERVICE
  val webServices: Seq[String] = Seq("rest_orders")

  // ---- VALUES-literal builders for the DuckDB oracle ----
  private def lit1(vs: Seq[String], cols: String) =
    vs.map(v => s"('$v')").mkString("(VALUES ", ", ", s") AS t($cols)")
  private def lit2ss(vs: Seq[(String, String)], cols: String) =
    vs.map { case (a, b) => s"('$a', '$b')" }.mkString("(VALUES ", ", ", s") AS t($cols)")

  def dbspacesLiteral: String = lit2ss(dbspaces, "dbspace_name, dbspace_type")
  def iqTablesLiteral: String =
    iqTables.map { case (i, r) => s"($i, '$r')" }
      .mkString("(VALUES ", ", ", ") AS t(table_id, is_rlv)")
  def serversLiteral: String = lit2ss(servers, "srvname, srvclass")
  def procsLiteral: String = lit2ss(procs, "proc_name, proc_defn")
  def usersLiteral: String = lit1(users, "user_name")
  def certificatesLiteral: String = lit1(certificates, "cert_name")
  def externalEnvsLiteral: String = lit1(externalEnvs, "env_name")
  def externalEnvObjsLiteral: String = lit1(externalEnvObjs, "obj_name")
  def spatialRefsLiteral: String =
    spatialRefs.map { case (i, n) => s"($i, '$n')" }
      .mkString("(VALUES ", ", ", ") AS t(srs_id, srs_name)")
  def tablesLiteral: String =
    tables.map { case (t, u, tt, st) => s"('$t', '$u', '$tt', '$st')" }
      .mkString("(VALUES ", ", ", ") AS t(table_name, user_name, table_type, server_type)")
  def indexesLiteral: String = lit2ss(indexes, "index_name, index_type")
  def iqFilesLiteral: String = lit2ss(iqFiles, "file_name, segment_type")
  def logicalServersLiteral: String =
    logicalServers.map { case (n, i) => s"('$n', $i)" }
      .mkString("(VALUES ", ", ", ") AS t(ls_name, ls_id)")
  def optionsLiteral: String = lit2ss(options, "\"option\", setting")
  def mpxNodesLiteral: String = lit2ss(mpxNodes, "server_name, role")
  def checkOptionsLiteral: String =
    checkOptions.map { case (n, t, u) => s"('$n', '$t', '$u')" }
      .mkString("(VALUES ", ", ", ") AS t(option_name, option_type, opt_user)")
  def webServicesLiteral: String = lit1(webServices, "ws_name")
}
