package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The cluster conf profile (VERDICT r13 lead 6): the three measured
  * "right locally, different at scale" knobs ship as code, pinned here
  * so a refactor can't silently drop the at-scale guidance. Pure conf
  * assertions — no session is created (getOrCreate would alias another
  * suite's active session and assert against the wrong profile).
  */
class GraftSessionProfileSpec extends AnyFunSuite {

  test("cluster profile encodes the documented at-scale deltas") {
    val c = GraftSession.clusterConfs()
    // lever 1: shuffle width — 32 locally, 2048 default at scale
    assert(c("spark.sql.shuffle.partitions").toInt >= 2048)
    // lever 2: AQE can re-plan heavy shuffles UP (the scoped local
    // negative: right at scale10+, wrong at sf0.1) — 4x the width
    assert(c("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toInt ===
      4 * c("spark.sql.shuffle.partitions").toInt)
    // lever 3: maxPartitionBytes returns to Spark's 128 MB default —
    // the local 16 MB compensates for single-small-file harness tables
    assert(c("spark.sql.files.maxPartitionBytes").toLong === 128L * 1024 * 1024)
    // the broadcast ceiling reasoning is scale-invariant: 64 MB
    assert(c("spark.graft.broadcastBytes").toLong === 64L * 1024 * 1024)
    // parameterization scales both coupled knobs together
    val w = GraftSession.clusterConfs(shufflePartitions = 8192)
    assert(w("spark.sql.shuffle.partitions").toInt === 8192)
    assert(w("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toInt === 32768)
  }

  test("cluster() fails loud instead of silently no-opping against an existing session") {
    // getOrCreate ignores builder confs when a session exists
    // (SPARK-31532): the profile must refuse rather than not apply
    val existing = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").appName("graft-profile-guard").getOrCreate()
    try intercept[IllegalStateException](GraftSession.cluster())
    finally existing.stop()
  }

  test("cluster profile inherits every shared base conf (no profile fork)") {
    val c = GraftSession.clusterConfs()
    GraftSession.baseConfs.foreach { case (k, v) =>
      assert(c.get(k).contains(v), s"cluster profile dropped base conf $k")
    }
    // semantics-bearing invariants both profiles must carry
    assert(c("spark.sql.session.timeZone") === "UTC")
    assert(c("spark.sql.legacy.parquet.nanosAsLong") === "true")
    assert(c("spark.sql.adaptive.enabled") === "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") === "true")
  }
}
