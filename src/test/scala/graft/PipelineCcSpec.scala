package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineQueries

/** Connected components: the large-star/small-star production path and
  * the min-label propagation cross-check must agree with each other AND
  * with a single-machine union-find oracle on randomized graphs —
  * including diameter-heavy chains where propagation needs many rounds
  * and the star alternation must still converge to identical output.
  */
class PipelineCcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cc-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Single-machine union-find reference. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    val sp = spark
    import sp.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    val want = unionFind(edges)
    val star = PipelineQueries.connectedComponentsStar(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = PipelineQueries.connectedComponentsPropagation(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CachedRdds.drain()
    assert(star == want, s"$clue: star vs union-find")
    assert(prop == want, s"$clue: propagation vs union-find")
  }

  test("chain graph (worst case for propagation's diameter bound)") {
    check((0L until 60L).map(i => (i, i + 1)), "chain-61")
  }

  test("two cliques bridged by one edge, ids descending") {
    val c1 = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val c2 = for (i <- 20L to 24L; j <- (i + 1) to 24L) yield (i, j)
    check(c1 ++ c2 :+ (14L -> 20L), "bridged-cliques")
  }

  test("randomized graphs agree with union-find (seeded)") {
    val r = new java.util.Random(20260813L)
    for (trial <- 0 until 6) {
      val n = 30 + r.nextInt(40)
      val m = n + r.nextInt(2 * n)
      val edges = Seq.fill(m) {
        val a = r.nextInt(n).toLong; val b = r.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) check(edges, s"random-$trial (n=$n m=${edges.size})")
    }
  }

  test("single edge and star-shaped input are already fixed points") {
    check(Seq((5L, 9L)), "single-edge")
    check((1L to 6L).map(i => (0L, i)), "star")
  }

  test("star-CC rounds stay single-action (job-count ceiling)") {
    // Each star round runs EXACTLY ONE action (the fused
    // materialize+diff rdd.aggregate), plus ONE upfront aggregate that
    // materializes the initial canonical-distinct leaf. Round 10 measured
    // the lazy-init alternative (fold the distinct into round 1's plan
    // and rely on exchange reuse): it shaved 2 jobs on THIS trivial chain
    // but on the real candidate-pair path reuse missed and re-derived the
    // edge source per reference — q_c13 39 → 77 jobs (PERF.md round 10) —
    // so the leaf stays. Under AQE an action fans out into one job per
    // shuffle stage, so the observable is a per-graph job total. A
    // 17-node chain (~5 rounds) measured 47 jobs with the round fusion +
    // materialized init vs 57 round-8 (separate convergence action) — the
    // ceiling below would trip if a per-round extra action crept back in,
    // while leaving slack for AQE stage-planning drift.
    val sp = spark
    import sp.implicits._
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val chain = (1L to 16L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      Thread.sleep(300) // let queued listener events from prior tests drain
      val before = counter.get()
      val out = PipelineQueries.connectedComponentsStar(spark, chain)
      Thread.sleep(300)
      val loopJobs = counter.get() - before
      assert(out.collect().length == 17)
      info(s"chain17 star-CC loop jobs: $loopJobs")
      assert(loopJobs <= 51, s"convergence should not cost extra actions: $loopJobs jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      graft.core.CachedRdds.drain()
    }
  }

  test("empty candidate set yields empty clusters from BOTH implementations") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(PipelineQueries.connectedComponentsStar(spark, empty).isEmpty)
    assert(PipelineQueries.connectedComponentsPropagation(spark, empty).isEmpty)
    graft.core.CachedRdds.drain()
  }
}
