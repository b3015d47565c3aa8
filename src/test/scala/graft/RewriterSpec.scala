package graft

import graft.rewrite.{ReloadFixture, Rewriter}

class RewriterSpec extends SparkTestBase {

  lazy val out = Rewriter.rewrite(spark, ReloadFixture.lines).collect().sortBy(_.line_no)

  test("segmentation assigns one stmt_id per go-delimited statement") {
    // fixture has 11 `go` lines → statements 0..10; every line belongs to
    // the statement whose `go` closes it (the go line included)
    val goLines = ReloadFixture.lines.zipWithIndex.filter(_._1.trim.equalsIgnoreCase("go"))
    assert(goLines.size == 11)
    val byLine = out.map(l => l.line_no -> l.stmt_id).toMap
    // first statement: lines 0-2 (header comment + SET + go)
    assert(byLine(0L) == 0 && byLine(2L) == 0)
    // line after the first go starts stmt 1
    assert(byLine(3L) == 1)
    // last line (final go) is in the last statement
    assert(byLine((ReloadFixture.lines.size - 1).toLong) == 10)
  }

  test("artifact rules comment the unsupported statement classes") {
    def stmtOf(snippet: String): Long =
      out.find(_.text.contains(snippet)).getOrElse(fail(s"line with '$snippet' missing")).stmt_id
    val commented = out.filter(_.commented).map(_.stmt_id).toSet
    assert(commented.contains(stmtOf("CREATE TEXT CONFIGURATION")))
    assert(commented.contains(stmtOf("EXTERNAL NAME")))
    assert(commented.contains(stmtOf("FOR HNG")))
    assert(commented.contains(stmtOf("password values")))
    // plain CREATE TABLE / VIEW / COMMIT statements stay
    assert(!commented.contains(stmtOf("CREATE VIEW")))
    assert(!commented.contains(stmtOf("COMMIT WORK")))
  }

  test("CREATE DOMAIN is kept with the AS USER suffix stripped (C3)") {
    val domainLine = out.find(_.text.contains("CREATE DOMAIN"))
      .getOrElse(fail("domain line missing"))
    assert(!domainLine.commented && !domainLine.is_fk)
    assert(!domainLine.text.contains("AS USER"))
    assert(domainLine.text.contains("NUMERIC(18,2)"))
  }

  test("login policy rewrite clones root and reassigns non-admin users (C4)") {
    val out = Rewriter.loginPolicyRewrite(
      rootOptions = Map("max_failed_login_attempts" -> "10", "locked" -> "OFF"),
      defaults = Map("max_failed_login_attempts" -> "5", "locked" -> "OFF"),
      users = Seq("analyst", "DBA", "etl_user"))
    assert(out.head.startsWith("CREATE LOGIN POLICY \"c_root\""))
    assert(out.head.contains("max_failed_login_attempts=10"))
    assert(!out.head.contains("locked")) // unchanged options not cloned
    assert(out.count(_.startsWith("ALTER USER")) == 2) // DBA excluded
    // no deviation → no rewrite at all
    assert(Rewriter.loginPolicyRewrite(
      Map("a" -> "1"), Map("a" -> "1"), Seq("u")).isEmpty)
  }

  test("foreign key statements are split out, not commented") {
    val fkLines = out.filter(_.is_fk)
    assert(fkLines.nonEmpty)
    assert(fkLines.forall(l => !l.commented))
    assert(fkLines.exists(_.text.contains("FOREIGN KEY")))
    assert(fkLines.exists(_.text.contains("REFERENCES")))
  }

  test("word-replace rules rewrite kept statements only") {
    // kept CREATE TABLE had owner "DBA" and dbspace IQ_SYSTEM_MAIN
    val kept = out.filter(l => !l.commented && !l.is_fk).map(_.text).mkString("\n")
    assert(kept.contains("\"HDLADMIN\".\"customer\""))
    assert(kept.contains("user_object_store"))
    assert(!kept.contains("IQ_SYSTEM_MAIN"))
    // commented lines keep their original text (prefixing happens at serialize)
    val commentedText = out.filter(_.commented).map(_.text).mkString("\n")
    assert(commentedText.contains("CREATE TEXT CONFIGURATION"))
  }

  test("segmentation invariants hold on randomized scripts (C1 property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val lineGen = Gen.frequency(
      5 -> Gen.alphaNumStr.map(s => s"STATEMENT $s"),
      2 -> Gen.const("go"),
      1 -> Gen.const("  GO  "),
      1 -> Gen.const(""),
      1 -> Gen.const("-- comment"))
    val prop = Prop.forAll(Gen.listOfN(40, lineGen)) { lines =>
      val df = lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("line_no", "text")
      val seg = Rewriter.segment(df)
        .select("line_no", "stmt_id", "is_go").collect().sortBy(_.getLong(0))
      val stmtIds = seg.map(_.getLong(1))
      val gos = seg.map(_.getInt(2))
      // monotone non-decreasing, steps of exactly the preceding go count
      val monotone = stmtIds.zip(stmtIds.tail).forall { case (a, b) => b == a || b == a + 1 }
      val firstIsZero = stmtIds.headOption.forall(_ == 0)
      // stmt id == number of go lines strictly before the line
      val exact = seg.indices.forall(i => stmtIds(i) == gos.take(i).count(_ == 1))
      monotone && firstIsZero && exact
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("serialization brackets with sentinels and prefixes comments") {
    val (main, fk) = Rewriter.serialize(out.toSeq)
    assert(main.startsWith("-- Begin AutoUpdated_Reload"))
    assert(main.trim.endsWith("-- Completed AutoUpdated_Reload"))
    assert(main.contains("-- Begin unsupported statement"))
    assert(main.contains("-- CREATE TEXT CONFIGURATION"))
    assert(fk.contains("FOREIGN KEY"))
    assert(fk.trim.endsWith("-- Completed Foreign_Key_Constraint"))
    // completeness invariant (migration.py:1301-1336): every input line
    // yields exactly one output record, and its serialized form is either
    // the original text or its word-replaced rewrite
    assert(out.length == ReloadFixture.lines.size)
    ReloadFixture.lines.foreach { l =>
      val replaced = l.replaceAll("(?i)\\bDBA\\b", "HDLADMIN")
        .replaceAll("(?i)\\bIQ_SYSTEM_MAIN\\b", "user_object_store")
      val stripped = replaced.replaceAll("(?i)\\s+AS USER\\s+.*$", "")
      assert(main.contains(l) || main.contains(replaced) || main.contains(stripped),
        s"missing line: $l")
    }
  }
}
