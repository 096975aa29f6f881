package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c56 — the loader-side epoch shuffle. The oracle proves engine
  * parity; these pin the SHUFFLE properties: a permutation per epoch
  * (every doc exactly once), epochs that genuinely reorder, and batch
  * assignment balanced enough to feed a loader.
  */
class EpochShuffleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-epoch-shuffle-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("each epoch is a full permutation, epochs reorder, batches are balanced") {
    val rows = SparkEntry.queries("q_c56_epoch_shuffle")(spark, sf).collect()
    val nDocs = graft.core.Tables(spark, sf, "documents").count()
    val byEpoch = rows.groupBy(_.getLong(0))
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.foreach { case (ep, rs) =>
      // permutation: every doc exactly once per epoch
      assert(rs.length.toLong === nDocs, s"epoch $ep row count")
      assert(rs.map(_.getLong(3)).distinct.length.toLong === nDocs,
        s"epoch $ep must list each doc exactly once")
      // positions within a batch are 1..batchSize with no gaps
      rs.groupBy(_.getLong(1)).foreach { case (b, brs) =>
        val ps = brs.map(_.getLong(2)).sorted
        assert(ps.head === 1L && ps.last === ps.length.toLong,
          s"epoch $ep batch $b positions must be dense 1..n")
      }
      // balance: 64 hash buckets over 1000 docs — no bucket pathological
      val sizes = rs.groupBy(_.getLong(1)).values.map(_.length)
      assert(sizes.size === 64 && sizes.max < 3 * (nDocs / 64).toInt,
        s"epoch $ep batch sizes skewed: min ${sizes.min} max ${sizes.max}")
    }
    // the two epochs genuinely reorder: same doc, different batch for
    // most docs (hash-salted key)
    val b0 = byEpoch(0L).map(r => r.getLong(3) -> r.getLong(1)).toMap
    val b1 = byEpoch(1L).map(r => r.getLong(3) -> r.getLong(1)).toMap
    val moved = b0.keys.count(d => b0(d) != b1(d))
    assert(moved > nDocs * 0.9,
      s"epoch salt must reassign batches: only $moved of $nDocs moved")
  }
}
