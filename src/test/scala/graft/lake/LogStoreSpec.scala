package graft.lake

import java.nio.file.Path

import graft.GraftSparkSpec

/** The [[LogStore]] seam: every commit's atomicity funnels through
  * `createExclusive`, so a store-level lost race must surface as the
  * same clean optimistic retry/conflict the POSIX path produces —
  * proving the protocol above the seam is store-agnostic (an object
  * store with conditional put slots in without re-auditing commits).
  */
class LogStoreSpec extends GraftSparkSpec {

  /** Pretends an exclusive create lost the race exactly once per
    * matching suffix — the contract an S3 `If-None-Match: *` put
    * refusal would produce.
    */
  private final class LoseOnce(suffix: String) extends LogStore {
    @volatile var losses = 0
    override def createExclusive(p: Path, content: Array[Byte]): Boolean =
      if (losses == 0 && p.getFileName.toString.endsWith(suffix)) {
        losses += 1
        false
      } else PosixLogStore.createExclusive(p, content)
    override def read(p: Path): Array[Byte] = PosixLogStore.read(p)
    override def exists(p: Path): Boolean = PosixLogStore.exists(p)
  }

  test("a lost version-file create retries and still commits") {
    val dir = tmpDir("logstore-retry")
    val store = new LoseOnce("00.json") // first version file attempt
    val log = new TxnLog(dir, store)
    val v = log.commit(Seq(
      CommitInfo(1L, "WRITE", Map.empty, Map.empty)))
    assert(store.losses == 1, "the fake must have exercised the race path")
    assert(v == 0, s"the blind-retry commit must land at 0, got $v")
    assert(log.readCommit(0).collectFirst {
      case c: CommitInfo => c.operation
    }.contains("WRITE"))
  }

  test("a lost decision create yields the winner's outcome") {
    val dir = tmpDir("logstore-decide")
    val log = new TxnLog(dir)
    val coord = java.nio.file.Paths
      .get(dir, "_graft_log", "_txncoord", "t1.decision")
      .toAbsolutePath.toString
    // a concurrent accessor aborts first; the coordinator's commit
    // attempt must observe (not overwrite) that outcome
    assert(log.decide(coord, "abort") == "abort")
    assert(log.decide(coord, "commit") == "abort",
      "the decision is immutable once created — losers read the winner")
  }

  test("default store is POSIX create-new (two logs, one winner)") {
    val dir = tmpDir("logstore-race")
    val a = new TxnLog(dir)
    val b = new TxnLog(dir)
    assert(a.tryCommitAt(0, Seq(CommitInfo(1L, "A", Map.empty, Map.empty))))
    assert(!b.tryCommitAt(0, Seq(CommitInfo(2L, "B", Map.empty, Map.empty))),
      "the second create of the same version must lose cleanly")
    assert(b.readCommit(0).collectFirst {
      case c: CommitInfo => c.operation
    }.contains("A"))
  }
}
