package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c80 — Kneser-Ney's defining behavior on a planted corpus: a word
  * that is frequent but only ever follows ONE context (the "francisco"
  * case) must carry a minimal continuation count, while an equally
  * frequent word completing many contexts carries a large one — and the
  * interpolated probabilities are well-formed.
  */
class KnBigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-kn-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-kn").toString
    val s = spark
    import s.implicits._
    // "francisco" appears 10 times, always after "san"; "common" also
    // appears 10 times but after 10 DIFFERENT words.
    val ctxs = Seq("red", "blue", "green", "tall", "small", "old", "new",
      "fast", "slow", "warm")
    // doc 20 (20 % 17 = 3 → held out, like doc 3) ends in a token never
    // seen in training — the deepest q_c84 backoff rung. doc 37 (also
    // held out) is built of tokens never seen in training at all: every
    // q_c87 trigram rung falls through to the deepest bigram rung.
    val docs = (0 until 10).map { i =>
      (i.toLong, s"san francisco ${ctxs(i)} common words fill this line")
    } :+ (20L, "common zzztail") :+ (37L, "zzza zzzb zzzc")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c80: continuation counts separate one-context words from many-context words") {
    val rows = SparkEntry.queries("q_c80_kn_bigram_lm")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val sf = byPair(("san", "francisco"))
    val cm = byPair(("green", "common"))
    assert(sf.getLong(2) === 10L, "san francisco count")
    assert(sf.getAs[Long]("cont_types") === 1L,
      "'francisco' completes exactly one context")
    assert(cm.getAs[Long]("cont_types") === 10L,
      "'common' completes ten distinct contexts")
    // well-formed probabilities, and the discount shifts mass toward the
    // versatile word within an equal-count comparison of p_cont
    rows.foreach { r =>
      val p = r.getAs[Double]("p_kn")
      assert(p > 0.0 && p <= 1.0, s"p_kn in (0,1]: $r")
    }
    // per left context, total smoothed mass over OBSERVED continuations
    // stays below 1 (the held-back discount mass covers the unseen tail)
    for ((w1, rs) <- rows.groupBy(_.getString(0))) {
      val mass = rs.map(_.getAs[Double]("p_kn")).sum
      assert(mass <= 1.0 + 1e-9, s"observed mass for '$w1' = $mass")
    }
  }

  test("q_c84: every backoff rung scores finite, unseen events cost more") {
    val rows = SparkEntry.queries("q_c84_kn_heldout_ppl")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    // exactly the held-out docs with >= 2 tokens: 3, 20 and 37
    assert(byDoc.keySet === Set(3L, 20L, 37L))
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0,
        s"doc ${r.getLong(0)}: smoothing must keep every rung finite")
    }
    // doc 3 is mostly observed bigrams (one unseen); doc 20's single
    // bigram falls to the unseen-continuation rung — it must cost more
    assert(byDoc(20L).getAs[Double]("avg_nll") > byDoc(3L).getAs[Double]("avg_nll"),
      "an unseen continuation must carry a higher NLL than observed text")
  }

  test("q_c87: the trigram ladder covers every rung, all finite, unseen text costs most") {
    val rows = SparkEntry.queries("q_c87_kn_trigram_ppl")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    // held-out docs with >= 3 tokens: 3 (mixed rungs — "san francisco
    // tall" is an unseen trigram over a SEEN (san, francisco) context;
    // "common words fill" is a fully observed trigram; "francisco tall
    // common" falls through an unseen trigram context to the bigram
    // ladder) and 37 (every rung unseen down to 1/(types+V)). doc 20 has
    // only 2 tokens — no trigram, excluded by construction.
    assert(byDoc.keySet === Set(3L, 37L))
    rows.foreach { r =>
      val nll = r.getAs[Double]("avg_nll")
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0,
        s"doc ${r.getLong(0)}: smoothing must keep every trigram rung finite")
    }
    assert(byDoc(3L).getAs[Long]("n_trigrams") === 6L, "8 tokens -> 6 trigrams")
    assert(byDoc(37L).getAs[Long]("n_trigrams") === 1L)
    // a document of entirely-unseen tokens must cost more per trigram
    // than one whose trigrams are mostly observed in training
    assert(byDoc(37L).getAs[Double]("avg_nll") > byDoc(3L).getAs[Double]("avg_nll"),
      "fully-unseen text must carry the highest per-trigram NLL")
  }

  test("q_c94: trigram estimation table is well-formed and mass stays below 1 per context") {
    val rows = SparkEntry.queries("q_c94_kn_trigram_lm")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byTri = rows.map(r =>
      (r.getString(0), r.getString(1), r.getString(2)) -> r).toMap
    // full-corpus estimation (no holdout): docs 0..9 all contain it
    assert(byTri(("common", "words", "fill")).getAs[Long]("cnt3") === 10L)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_kn3")
      assert(p > 0.0 && p <= 1.0, s"p_kn3 in (0,1]: $r")
    }
    // discounting holds back mass for the unseen tail within each
    // observed (w1, w2) context
    for (((w1, w2), rs) <- rows.groupBy(r => (r.getString(0), r.getString(1)))) {
      val mass = rs.map(_.getAs[Double]("p_kn3")).sum
      assert(mass <= 1.0 + 1e-9, s"observed trigram mass for ($w1, $w2) = $mass")
    }
  }
}
