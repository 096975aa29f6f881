package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat_ws, lit}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SessionMemo

/** Snapshot keying and reuse of [[graft.core.SessionMemo]]:
  *
  *  - a repeat invocation of q_b6 (whose garr build is memoized) in one
  *    session must NOT rebuild the dictionary/garr pipeline — the build
  *    closure runs once and the memo hands back the same persisted frame
  *    (skipping the explode scan, rarity sort, sizes job, and
  *    dictionary-encode shuffle the build runs eagerly);
  *  - rewriting the documents fixture AT THE SAME PATH must invalidate the
  *    entry (mtime/length snapshot) and rebuild with results reflecting
  *    the new data — the round-8 stale-memo watch item;
  *  - the MinHash candidate memo shares the same snapshot guard.
  */
class SessionMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = s"/tmp/graft_memo_spec_${System.nanoTime()}"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sessionmemo-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    val root = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(root)
  }

  /** Write a documents fixture; texts differ in length between versions so
    * the (mtime, length) snapshot is guaranteed to change even on a
    * filesystem with coarse mtime granularity.
    */
  private def writeDocs(rows: Seq[(Long, String, String)]): Unit = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private val baseDocs = Seq(
    (1L, "web", "the quick brown fox jumps over the lazy dog"),
    (2L, "web", "the quick brown fox jumps over the lazy dog"),
    (3L, "web", "entirely different words compose this third document body"))

  private def runB6(): Seq[(Long, Long)] =
    SparkEntry.queries("q_b6_jaccard_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("repeat q_b6 reuses the memoized garr; fixture rewrite rebuilds") {
    writeDocs(baseDocs)
    val b0 = SessionMemo.buildCount("garr_word_shingle")
    val first = runB6()
    assert(first == Seq((1L, 2L)), s"identical docs 1,2 must pair: $first")
    assert(SessionMemo.buildCount("garr_word_shingle") == b0 + 1)
    assert(SessionMemo.occupied("garr_word_shingle"))

    // same session, same fixture → memo hit: build closure NOT re-run
    val second = runB6()
    assert(second == first)
    assert(SessionMemo.buildCount("garr_word_shingle") == b0 + 1,
      "repeat invocation must not rebuild the garr pipeline")

    // rewrite AT THE SAME PATH with different content → snapshot mismatch
    // → rebuild, and the output must reflect the new corpus
    writeDocs(baseDocs :+
      (4L, "web", "entirely different words compose this third document body"))
    val third = runB6()
    assert(SessionMemo.buildCount("garr_word_shingle") == b0 + 2,
      "fixture rewrite at the same path must invalidate the memo")
    assert(third == Seq((1L, 2L), (3L, 4L)), s"new duplicate must appear: $third")
  }

  test("minhash candidate memo rebuilds on fixture rewrite too") {
    writeDocs(baseDocs)
    val b0 = SessionMemo.buildCount("minhash_cand")
    val first = SparkEntry.queries("q_c1_minhash_lsh")(spark, dir).collect()
    assert(SessionMemo.buildCount("minhash_cand") == b0 + 1)
    SparkEntry.queries("q_c1_minhash_lsh")(spark, dir).collect()
    assert(SessionMemo.buildCount("minhash_cand") == b0 + 1, "hit must not rebuild")

    writeDocs(baseDocs.map { case (id, src, t) => (id, src, t + " padded tail") })
    SparkEntry.queries("q_c1_minhash_lsh")(spark, dir).collect()
    assert(SessionMemo.buildCount("minhash_cand") == b0 + 2,
      "rewrite must invalidate the candidate memo")
    assert(first.nonEmpty)
  }

  test("size budget: an oversized frame is not memoized, a fitting one is") {
    val sp = spark
    import sp.implicits._
    writeDocs(baseDocs)
    try {
      // ~3 MB of rows vs a 64 KB budget: the build must still return a
      // usable (persisted-for-this-query) frame, but the memo must stay
      // empty so the blocks drain with the query instead of squatting in
      // the storage region (the q_c3 scale10 displacement, PERF.md r10)
      spark.conf.set("spark.graft.memo.maxBytes", (64 * 1024).toString)
      val big = SessionMemo.getOrBuild(spark, "budget_big", dir, Seq(s"$dir/documents.parquet")) {
        spark.range(100000).select(col("id"), concat_ws("-", lit("x" * 24), col("id")).as("t"))
      }
      assert(big.count() == 100000L)
      assert(!SessionMemo.occupied("budget_big"),
        "an over-budget frame must not be memoized")
      // a second call must REBUILD (miss), not serve a dropped entry
      SessionMemo.getOrBuild(spark, "budget_big", dir, Seq(s"$dir/documents.parquet")) {
        spark.range(10).toDF("id")
      }
      assert(SessionMemo.buildCount("budget_big") == 2L)

      // a small frame fits and is held, with its measured size recorded
      val small = SessionMemo.getOrBuild(spark, "budget_small", dir, Seq(s"$dir/documents.parquet")) {
        spark.range(100).toDF("id")
      }
      assert(small.count() == 100L)
      assert(SessionMemo.occupied("budget_small"))
      assert(SessionMemo.heldBytes("budget_small").exists(b => b > 0L && b <= 64 * 1024))
    } finally {
      spark.conf.unset("spark.graft.memo.maxBytes")
      graft.core.CachedRdds.drain()
      SessionMemo.evict(Some(spark))
    }
  }

  test("size budget: total across entries evicts oldest first") {
    val sp = spark
    import sp.implicits._
    writeDocs(baseDocs)
    try {
      // each entry ~tens of KB; budget sized to hold roughly one of them
      val one = {
        val df = SessionMemo.getOrBuild(spark, "budget_a", dir, Seq(s"$dir/documents.parquet")) {
          spark.range(2000).select(col("id"), concat_ws("-", lit("y" * 16), col("id")).as("t"))
        }
        df.count()
        SessionMemo.heldBytes("budget_a").get
      }
      spark.conf.set("spark.graft.memo.maxBytes", (one + one / 2).toString)
      SessionMemo.getOrBuild(spark, "budget_b", dir, Seq(s"$dir/documents.parquet")) {
        spark.range(2000).select(col("id"), concat_ws("-", lit("z" * 16), col("id")).as("t"))
      }.count()
      assert(SessionMemo.occupied("budget_b"), "the newest entry must be kept")
      assert(!SessionMemo.occupied("budget_a"),
        "the oldest entry must be evicted when the total exceeds the budget")
    } finally {
      spark.conf.unset("spark.graft.memo.maxBytes")
      graft.core.CachedRdds.drain()
      SessionMemo.evict(Some(spark))
    }
  }
}
