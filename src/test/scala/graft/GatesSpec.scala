package graft

import graft.premigration.Gates
import graft.premigration.Gates.MpxNode

/** Environment-gate branches (migration.py:316-414). */
class GatesSpec extends SparkTestBase {

  val mpx = Seq(
    MpxNode("coord1", "coordinator", "included", "active"),
    MpxNode("w1", "writer", "included", "active"),
    MpxNode("w2", "writer", "included", "active"),
    MpxNode("r1", "reader", "excluded", "active"))

  test("mpx gate: simplex passes; non-coordinator connection is rejected") {
    assert(Gates.mpxGate(Seq.empty, "any")._1.pass)
    val (bad, _) = Gates.mpxGate(mpx, "w1")
    assert(!bad.pass && bad.detail.contains("coordinator is coord1"))
    val (ok, secondaries) = Gates.mpxGate(mpx, "coord1")
    assert(ok.pass && secondaries == 2) // excluded reader doesn't count
  }

  test("version gate: 16.0 rejected, 16.1.01 uncompressed, newer compressed") {
    val (rej, _) = Gates.versionGate("SAP IQ/16.0.110.3")
    assert(!rej.pass)
    val (old, comp161) = Gates.versionGate("SAP IQ/16.1.01.100")
    assert(old.pass && !comp161)
    val (nu, compNew) = Gates.versionGate("SAP IQ/16.1.04")
    assert(nu.pass && compNew)
    // the flag feeds the extract format planner
    assert(graft.extract.Extract.chooseFormat(hasLob = false, comp161) ==
      graft.extract.Extract.PlainText)
    assert(graft.extract.Extract.chooseFormat(hasLob = false, compNew) ==
      graft.extract.Extract.GzipText)
  }

  test("readonly gate: On passes, refused probe passes, writable aborts unless forced") {
    assert(Gates.readonlyGate("On", () => fail("must not probe when On")).pass)
    assert(Gates.readonlyGate("Off", () => false).pass)
    assert(!Gates.readonlyGate("Off", () => true).pass)
    assert(Gates.readonlyGate("Off", () => true, forceWriteMode = true).pass)
  }

  test("evaluate produces the full gate relation") {
    val df = Gates.evaluate(spark, Map("version" -> "SAP IQ/16.1.04", "readonly" -> "On"),
      Seq.empty, "solo", () => true)
    val rows = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map("mpx_coordinator" -> true, "version" -> true, "readonly" -> true))
  }
}
