package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c88 — LSH band recall calibration against the analytic
  * 1 − (1 − s²)³ model (r = 2 rows × b = 3 bands).
  *
  * The planted fixture pins both ends of the S-curve exactly: an
  * identical pair (s = 1) must land in decile 10 with expected AND
  * observed recall exactly 1.0 (identical shingle sets ⇒ identical
  * signatures ⇒ the banding cannot miss), and a pair with a known
  * rational Jaccard must report the closed-form expected probability,
  * quantized exactly as the query does. The sf0.001 test asserts the
  * report's structural guarantees: the buckets partition the verified
  * pair set, recalls are probabilities, and expected recall is
  * monotone in the Jaccard decile (the S-curve is increasing).
  */
class LshCalibrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-lshcal-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-lshcal").toString
    val s = spark
    import s.implicits._
    val twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      // s = 1: identical 10-word docs (8 shingles each, all shared)
      (1L, twin), (2L, twin),
      // known rational s: 10 words differing only in the last one —
      // 7 of 8 shingles shared, union 9 ⇒ s = 7/9, decile 7
      (3L, "north south east west upward downward inward outward forward backward"),
      (4L, "north south east west upward downward inward outward forward sideways"),
      // unrelated filler (shares nothing; below τ with everything)
      (5L, "solitary unique text nothing shares these particular words ever today"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c88 planted: both ends of the S-curve are exact") {
    val rows = SparkEntry.queries("q_c88_lsh_recall")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byDecile = rows.map(r => r.getLong(0) -> r).toMap
    assert(byDecile.keySet === Set(7L, 10L))

    val ten = byDecile(10L)
    assert(ten.getAs[Long]("n_pairs") === 1L)
    assert(ten.getAs[Long]("n_detected") === 1L,
      "identical docs have identical signatures — banding cannot miss s = 1")
    assert(ten.getAs[Double]("observed_recall") === 1.0)
    assert(ten.getAs[Double]("expected_recall") === 1.0)

    val seven = byDecile(7L)
    assert(seven.getAs[Long]("n_pairs") === 1L)
    // the query's own arithmetic, replayed: IEEE double S-curve at
    // s = 7/9, quantized to DECIMAL(18,6) per pair
    val sVal = 7.0 / 9.0
    val expP = BigDecimal(1 - (1 - sVal * sVal) * (1 - sVal * sVal) * (1 - sVal * sVal))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(seven.getAs[Double]("expected_recall") === expP)
  }

  test("q_c92 planted: identical docs match all 6 signature components exactly") {
    val rows = SparkEntry.queries("q_c92_minhash_estimator")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val byDecile = rows.map(r => r.getLong(0) -> r).toMap
    assert(byDecile.keySet === Set(7L, 10L))
    val ten = byDecile(10L)
    assert(ten.getAs[Long]("n_pairs") === 1L)
    assert(ten.getAs[Long]("sig_matches") === 6L,
      "identical shingle sets hash to identical signatures")
    assert(ten.getAs[Double]("mean_est") === 1.0)
    assert(ten.getAs[Double]("mean_jaccard") === 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("sig_matches") <= 6L * r.getAs[Long]("n_pairs"))
      val est = r.getAs[Double]("mean_est")
      assert(est >= 0.0 && est <= 1.0)
    }
  }

  test("q_c92 on sf0.001: buckets partition the verified pairs; estimates are probabilities") {
    val rows = SparkEntry.queries("q_c92_minhash_estimator")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val exact = SparkEntry.queries("q_b6_jaccard_neardup")(spark, sf).count()
    graft.core.CachedRdds.drain()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === exact)
    rows.foreach { r =>
      assert(r.getAs[Long]("sig_matches") <= 6L * r.getAs[Long]("n_pairs"))
      val est = r.getAs[Double]("mean_est")
      val tru = r.getAs[Double]("mean_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // the bucket's true-Jaccard mean must sit inside the bucket
      val d = r.getLong(0)
      assert(tru >= d / 10.0 - 1e-9 && tru <= (d + 1) / 10.0 + 1e-9)
    }
  }

  test("q_c95 planted: identical docs recalled at the shipped w; exact-pair base is constant") {
    val rows = SparkEntry.queries("q_c95_winnow_calibration")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    assert(rows.map(_.getAs[Long]("n_exact")).distinct.toSeq === Seq(2L),
      "the exact tau=0.5 base (both planted pairs) must not vary with w")
    val byW = rows.map(r => r.getLong(0) -> r).toMap
    // identical 10-word docs carry 8 hashes: >= 2 distinct window minima
    // at w = 2 and w = 4, so the s = 1 pair must be recalled there; at
    // w = 8 a single window survives and the >= 2-shared rule drops it —
    // exactly the guarantee-window shrinkage the sweep exists to show
    assert(byW(2L).getAs[Long]("n_recalled") >= 1L)
    assert(byW(4L).getAs[Long]("n_recalled") >= 1L)
    // fingerprint-count monotonicity (the winnowing subset theorem —
    // an s-selected min over w=8 is the min of one of its two w=4
    // sub-windows, so fp(w8) ⊆ fp(w4) ⊆ fp(w2) per doc)
    val nf = rows.map(_.getAs[Long]("n_fingerprints"))
    assert(nf(0) >= nf(1) && nf(1) >= nf(2))
  }

  test("q_c95 on sf0.001: index size shrinks with w; recalls are probabilities") {
    val rows = SparkEntry.queries("q_c95_winnow_calibration")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    assert(rows.map(_.getAs[Long]("n_exact")).distinct.length === 1)
    val nf = rows.map(_.getAs[Long]("n_fingerprints"))
    assert(nf(0) >= nf(1) && nf(1) >= nf(2), s"subset theorem violated: ${nf.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_recalled") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("n_recalled") <= r.getAs[Long]("n_pairs"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("q_c88 on sf0.001: buckets partition the verified pairs; recalls behave") {
    val rows = SparkEntry.queries("q_c88_lsh_recall")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val exact = SparkEntry.queries("q_b6_jaccard_neardup")(spark, sf).count()
    graft.core.CachedRdds.drain()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === exact,
      "decile buckets must partition the exact verified pair set")
    rows.foreach { r =>
      val obs = r.getAs[Double]("observed_recall")
      val exp = r.getAs[Double]("expected_recall")
      assert(obs >= 0.0 && obs <= 1.0 && exp >= 0.0 && exp <= 1.0)
      assert(r.getAs[Long]("n_detected") <= r.getAs[Long]("n_pairs"))
      assert(r.getLong(0) >= 5L && r.getLong(0) <= 10L,
        "verified pairs sit at tau >= 0.5 by construction")
    }
    val byDecile = rows.sortBy(_.getLong(0)).map(_.getAs[Double]("expected_recall"))
    assert(byDecile.zip(byDecile.tail).forall { case (a, b) => a <= b },
      "the analytic S-curve is increasing in s, so decile means must be monotone")
  }

  test("q_c120 planted: every banding detects s = 1; closed-form expectation replays") {
    val rows = SparkEntry.queries("q_c120_lsh_band_grid")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    val grid = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(grid.keySet ===
      graft.operators.DedupQueries.lshGrid.map { case (b, r) => (b.toLong, r.toLong) }.toSet)
    // both planted pairs are verified (s = 1 and s = 7/9 >= tau)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") === 2L)
      // identical docs ⇒ identical signatures ⇒ NO banding can miss the
      // s = 1 pair, so every grid point detects at least one pair
      assert(r.getAs[Long]("n_detected") >= 1L)
    }
    // closed-form expectation at (1, 6): mean over the two pairs of
    // quantize(1 - (1 - s^6)), s ∈ {1, 7/9}, replayed in the query's
    // own arithmetic (IEEE products, DECIMAL(18,6) per pair, exact mean)
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val s79 = 7.0 / 9.0
    val p79 = {
      val s6 = s79 * s79 * s79 * s79 * s79 * s79
      q6(1.0 - (1.0 - s6))
    }
    val expected = ((q6(1.0) + p79) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(grid((1L, 6L)).getAs[Double]("expected_recall") === expected)
  }

  test("q_c120 on sf0.001: volume containment, recall monotonicity, q_c88 cross-pin") {
    val rows = SparkEntry.queries("q_c120_lsh_band_grid")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val grid = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(grid.size === graft.operators.DedupQueries.lshGrid.size)
    val exact = SparkEntry.queries("q_b6_jaccard_neardup")(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") === exact,
        "the true-pair base is the same exact q_b6 frame for every grid point")
      assert(r.getAs[Long]("n_detected") <= r.getAs[Long]("n_true"))
      val obs = r.getAs[Double]("observed_recall")
      val exp = r.getAs[Double]("expected_recall")
      assert(obs >= 0.0 && obs <= 1.0 && exp >= 0.0 && exp <= 1.0)
    }
    def cand(b: Long, r: Long) = grid((b, r)).getAs[Long]("n_candidates")
    // band-key containment: a match on a longer key implies a match on
    // each of its sub-keys, so coarser-key bandings generate supersets
    assert(cand(6, 1) >= cand(3, 2) && cand(3, 2) >= cand(2, 2),
      "(6,1) ⊇ (3,2) ⊇ (2,2) by band-key containment")
    assert(cand(2, 3) >= cand(1, 6) && cand(1, 3) >= cand(1, 6),
      "(2,3) and (1,3) each contain the full-signature (1,6) banding")
    // the analytic model is monotone in bands at fixed rows
    def exp(b: Long, r: Long) = grid((b, r)).getAs[Double]("expected_recall")
    assert(exp(3, 2) >= exp(2, 2) && exp(2, 3) >= exp(1, 3))
    // cross-pin: the shipped (3,2) grid row measures the SAME banding
    // against the SAME pair base as q_c88's per-decile report
    val c88 = SparkEntry.queries("q_c88_lsh_recall")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    assert(grid((3L, 2L)).getAs[Long]("n_detected") ===
      c88.map(_.getAs[Long]("n_detected")).sum,
      "grid (3,2) detection total must equal q_c88's decile sum")
  }
}
