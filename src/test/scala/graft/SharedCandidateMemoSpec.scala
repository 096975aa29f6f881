package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupQueries

/** Lifecycle of the session-scoped MinHash-candidate memo
  * ([[DedupQueries.minhashCandidatesShared]]): the slot must be reused
  * within a live session, evicted eagerly when the owning session stops
  * (round-8 listener — a long-lived multi-tenant process must not carry a
  * dead frame until the next call), and a fresh session must rebuild with
  * byte-identical output.
  */
class SharedCandidateMemoSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def newSession(): SparkSession = {
    // getOrCreate() would silently hand back another suite's live session
    // (wrong master/config) and this spec STOPS its sessions — stopping a
    // shared one would sabotage the rest of the JVM's suites. Force a
    // genuinely fresh context by stopping any leftover default first
    // (suites run sequentially, so nothing is mid-flight).
    SparkSession.getDefaultSession.filter(!_.sparkContext.isStopped)
      .foreach(_.stop())
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sharedcand-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("memo reuses within a session, evicts on stop, rebuilds identically") {
    val s1 = newSession()
    val first = DedupQueries.minhashCandidatesShared(s1, sf)
    val rows1 = first.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows1.nonEmpty, "sf0.001 documents must yield candidate pairs")
    assert(DedupQueries.sharedCandOccupied, "slot must hold the frame after build")

    // same (session, dir) → the exact same DataFrame instance (plan reuse)
    val again = DedupQueries.minhashCandidatesShared(s1, sf)
    assert(again eq first, "live hit must return the memoized frame")

    s1.stop()
    // SparkListenerApplicationEnd is delivered on the listener bus; stop()
    // drains it, but poll briefly to stay robust to bus scheduling
    val deadline = System.nanoTime() + 10e9.toLong
    while (DedupQueries.sharedCandOccupied && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(!DedupQueries.sharedCandOccupied,
      "slot must be evicted when the owning session stops")

    // a fresh session rebuilds from scratch with identical output
    val s2 = newSession()
    try {
      val rebuilt = DedupQueries.minhashCandidatesShared(s2, sf)
      assert(rebuilt ne first)
      val rows2 = rebuilt.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows2 == rows1, "rebuild must be bit-identical (deterministic pipeline)")
    } finally s2.stop()
  }

  test("q_c47/q_c73 share one fuzzy-decontamination pair frame per session") {
    val s = newSession()
    try {
      val first = DedupQueries.fuzzyPairsShared(s, sf)
      assert(first.collect().nonEmpty,
        "sf0.001 must yield fuzzy cross-set pairs (non-vacuous fixture)")
      assert(DedupQueries.fuzzySharedOccupied)
      // the report's fuzzy side must be the SAME memoized frame q_c47
      // serves — the cross-set LSH pipeline runs once per session
      assert(DedupQueries.fuzzyPairsShared(s, sf) eq first)
    } finally s.stop()
  }
}
