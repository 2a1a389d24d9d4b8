package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench sweep's validity gates (r14 verdict item 2): replaying
  * each historical contamination class against the pure decision
  * functions proves the class now self-stamps `valid:false`.
  */
class BenchGateSpec extends AnyFunSuite {

  test("r14's contaminated driver sweep self-rejects on the load gate: " +
      "load 5.98 at start on 32 cpus, narrow canaries CLEAN") {
    // the r14 artifact: canaries within band (the contention stole
    // cores from wide stages only), load_at_start 5.98 — previously
    // stamped valid:true, adjudicated contaminated by the judge
    assert(!Bench.loadGateOk(5.98, 32))
    assert(Bench.driftsOk(Seq(0.9, 1.1, 1.0), Seq(1.2, 1.0, 1.1)),
      "the narrow canaries alone would NOT have caught it — that is " +
        "why the load gate exists")
  }

  test("the committed r14 sweep's conditions stay valid: load 1.43, " +
      "drifts ~1") {
    assert(Bench.loadGateOk(1.43, 32))
    assert(Bench.driftsOk(Seq(1.0, 1.05, 0.98), Seq(1.1, 1.02, 1.05)))
  }

  test("symmetric endpoint bounds: an end canary far BELOW its start " +
      "floor rejects (r14 — a degraded start floor reads as " +
      "'everything improved')") {
    assert(!Bench.driftsOk(Seq(0.2), Nil))
    assert(!Bench.driftsOk(Seq(1.0, 0.45, 1.0), Nil))
    assert(Bench.driftsOk(Seq(0.7), Nil), "benign JIT warming passes")
  }

  test("replication rule: two same-tree sweeps at per-query median ~1 " +
      "certify the set; a contaminated block or thin overlap refuses") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 120).map(i => s"q$i" -> (0.2 + rnd.nextDouble())).toMap
    // honest replication: every query within ±10%
    val b = base.map { case (k, v) => k -> v * (0.95 + 0.1 * rnd.nextDouble()) }
    assert(Bench.replicationOk(base, b))
    // r10-style contamination: a contiguous 30-query block 6-29× slower
    val contaminated = base.map { case (k, v) =>
      val idx = k.stripPrefix("q").toInt
      k -> (if (idx <= 30) v * (6 + idx % 24) else v)
    }
    assert(!Bench.replicationOk(base, contaminated),
      "a 25% contaminated block must fail the 90% band rule")
    // a global 1.3× shift (different host band) fails the median rule
    assert(!Bench.replicationOk(base, base.map { case (k, v) => k -> v * 1.3 }))
    // too few common points cannot certify anything
    assert(!Bench.replicationOk(base.take(10), base.take(10)))
  }

  test("a mid-run burst that dies before the end canary rejects; the " +
      "load floor stays usable on small hosts") {
    assert(!Bench.driftsOk(Seq(1.0, 1.0, 1.0), Seq(1.0, 2.4, 1.0)))
    // max(3, cpus/10): an 8-cpu dev host keeps the absolute floor
    assert(Bench.loadGateOk(2.5, 8))
    assert(!Bench.loadGateOk(3.5, 8))
    // and a 64-cpu host scales it
    assert(Bench.loadGateOk(5.0, 64))
    assert(!Bench.loadGateOk(7.0, 64))
  }
}
