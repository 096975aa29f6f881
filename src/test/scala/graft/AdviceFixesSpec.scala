package graft

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BuildOnceCache, ContentId}

/** Regression coverage for the round-13 advisor findings: the
  * build-once cache latch (duplicate concurrent trainings), the 64-bit
  * model-bound function names (silent 31-bit collision rebinding), and
  * the q_c50 OLS degenerate-corpus guard (0/0 fit on <= 1 distinct
  * term). The CharBigramStats capacity guard is document-size-bounded
  * (2^28 bigrams) and cannot be exercised with a practical fixture; the
  * Long-math capacity computation it protects is asserted indirectly by
  * CharBigramEntropySpec's functional coverage.
  */
class AdviceFixesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-advice-fixes-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("BuildOnceCache: concurrent first callers share ONE build") {
    val cache = new BuildOnceCache[String, Int]
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        start.await()
        results.add(cache.getOrBuild("k", "snap1") {
          Thread.sleep(50) // widen the race window
          builds.incrementAndGet()
        })
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    assert(builds.get() === 1, "concurrent first callers must share one build")
    assert(results.size === 4 && results.stream().allMatch(_ == 1))
    // a snapshot change rebuilds exactly once more
    assert(cache.getOrBuild("k", "snap2")(builds.incrementAndGet()) === 2)
    assert(cache.getOrBuild("k", "snap2")(builds.incrementAndGet()) === 2)
  }

  test("model-bound function names are 64-bit (seed high bits distinguish)") {
    // pre-widening, BpeEncodeTokens folded only seed.toInt into the name:
    // two models differing only in the seed's HIGH 32 bits collided and
    // the second registration silently rebound the first name
    val merges = Seq(("a", "b"), ("ab", "c"))
    val n0 = graft.functions.BpeEncodeTokens.register(spark, merges, 100, seed = 7L)
    val nHi = graft.functions.BpeEncodeTokens.register(
      spark, merges, 100, seed = 7L | (1L << 35))
    assert(n0 !== nHi, "seed high bits must distinguish registered names")
    // idempotence: same content re-registers the same name
    assert(graft.functions.BpeEncodeTokens.register(spark, merges, 100, 7L) === n0)
    // the widened ids are full 64-bit hex, not 31-bit
    val h = ContentId.hex64(Int.MinValue, Int.MinValue)
    assert(java.lang.Long.parseUnsignedLong(h, 16) === 0x8000000080000000L)
  }

  test("q_c50 emits NULL fit columns on a degenerate (1-term) corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen").toString
    val s = spark
    import s.implicits._
    Seq((1L, "aaa aaa aaa"), (2L, "aaa"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_c50_zipf_fit")(spark, dir).collect()
    assert(rows.length === 1) // one distinct term => one ranked row
    val r = rows.head
    assert(r.getAs[Long]("n_terms") === 1L)
    assert(r.isNullAt(r.fieldIndex("slope")), "slope must be NULL, not NaN")
    assert(r.isNullAt(r.fieldIndex("intercept")), "intercept must be NULL, not NaN")
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }
}
