package graft.rewrite

/** Synthetic `reload.sql` fixture (FIXTURES.md §3): shaped like iqunload
  * output (`/root/reference/Migration/migration.py:609-617`) with one
  * representative of each statement class the rewriter handles. Static so
  * both the Spark implementation and the DuckDB oracle (a VALUES literal)
  * can consume identical input.
  */
object ReloadFixture {

  val lines: Seq[String] = Seq(
    "-- reload script header",
    "SET TEMPORARY OPTION conversion_error = 'OFF'",
    "go",
    "CREATE TABLE \"DBA\".\"customer\" (",
    "  c_id INTEGER NOT NULL,",
    "  c_name VARCHAR(64) NULL",
    ") IN \"IQ_SYSTEM_MAIN\"",
    "go",
    "CREATE TABLE \"DBA\".\"orders\" (",
    "  o_id INTEGER NOT NULL,",
    "  o_cust INTEGER NOT NULL",
    ")",
    "go",
    "ALTER TABLE \"DBA\".\"orders\" ADD FOREIGN KEY \"fk_cust\" (\"o_cust\")",
    "  REFERENCES \"DBA\".\"customer\" (\"c_id\")",
    "go",
    "CREATE TEXT CONFIGURATION \"myconf\" FROM \"default_char\"",
    "go",
    "CREATE PROCEDURE \"DBA\".\"ext_proc\"()",
    "  EXTERNAL NAME 'libfoo@native'",
    "go",
    "CREATE DOMAIN \"money_t\" NUMERIC(18,2) AS USER \"DBA\"",
    "go",
    // procedure whose body contains a line-rule artifact (call dbo.sa_sync):
    // the line pass comments that line, the sweep then comments the whole
    // procedure (migration.py:1248-1283)
    "CREATE PROCEDURE \"DBA\".\"sync_all\"()",
    "BEGIN",
    "  call dbo.sa_sync('full')",
    "END",
    "go",
    "CREATE INDEX \"idx_hng\" ON \"DBA\".\"orders\" (\"o_id\") FOR HNG",
    "go",
    // iqunload-style blank padding around the GRANT block: the reference's
    // password blanket comments ±4 lines unconditionally (migration.py:
    // 1221-1237), so real reload scripts rely on this spacing
    "",
    "",
    "",
    "GRANT CONNECT TO \"analyst\" IDENTIFIED BY password values '0x1234abcd'",
    "go",
    "",
    "",
    "",
    "CREATE VIEW \"DBA\".\"v_orders\" AS SELECT o_id FROM \"DBA\".\"orders\"",
    "go",
    "COMMIT WORK",
    "go")

  /** The fixture rendered as a DuckDB VALUES literal (line_no, text). */
  def valuesLiteral: String =
    lines.zipWithIndex
      .map { case (t, i) => s"($i, '${t.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ") AS t(line_no, text)")
}
