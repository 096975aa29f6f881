package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c29 semantic dedup (SemDeDup-style representative retention): the
  * planted corpus makes the retention rule's shape fully predictable, so
  * this spec asserts it END-TO-END rather than just non-emptiness:
  *   - every planted vector (vec_id ≥ 1 000 000, a perturbed copy at
  *     cos ≈ 0.9996 to its original) must be DROPPED with its
  *     representative equal to exactly its original (the only same-label
  *     vector within τ = 0.90 — the corpus's max original-to-original
  *     same-label cosine is ≈ 0.51, and planted-to-planted cosines
  *     inherit it), and
  *   - every original must be KEPT with a NULL representative.
  * A single LSH band miss, a wrong dominator aggregation, or a join that
  * drops unmatched rows all break at least one of these.
  */
class SemanticDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-semdedup-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q_c29: planted copies collapse onto exactly their originals; originals survive") {
    val out = SparkEntry.queries("q_c29_semantic_dedup")(spark, sf)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val rows = out.collect()
    assert(rows.length == 2 * nVecs, "one output row per corpus+planted vector")

    val (planted, originals) = rows.partition(_.getAs[Long]("vec_id") >= 1000000L)
    assert(planted.length == nVecs && originals.length == nVecs)
    // non-vacuous: the rule actually dropped half the union corpus
    assert(planted.forall(_.getAs[Int]("kept") == 0),
      "every planted copy must be dropped")
    assert(planted.forall(r =>
        r.getAs[Long]("representative") == r.getAs[Long]("vec_id") - 1000000L),
      "each planted copy's representative must be its own original")
    assert(originals.forall(r =>
        r.getAs[Int]("kept") == 1 && r.isNullAt(r.fieldIndex("representative"))),
      "every original must be kept with no representative")
  }

  test("dense duplicate family collapses onto its single min-id representative") {
    // round-14 lead 4: a dense near-dup family makes ONE representative a
    // hot join key (every family pair shares vec_a = the min id). Build a
    // corpus whose majority is one 300-member family of tiny perturbations
    // around a common vector (all pairwise cosines ≈ 1 ≫ τ): the LSH
    // bucket holds the whole family, candidates are ~C(300,2), and the
    // retention rule must still collapse every member onto exactly the
    // family minimum — while AQE's skew handling absorbs the hot key (the
    // join is an equi-join, splittable; this pins the semantics under
    // that load shape).
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val base = Array.fill(dim)(rnd.nextGaussian())
    val family = (0 until 300).map { i =>
      (100L + i, 0L, base.map(x => (x + 0.001 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val loners = (0 until 50).map { i =>
      (1000L + i, 0L, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("densefam").toString
    (family ++ loners).toDF("vec_id", "label", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_c29_semantic_dedup")(spark, dir)
      .filter(col("vec_id") < 1000000L) // ignore the query's own planted copies
      .collect()
    val fam = out.filter(r => r.getAs[Long]("vec_id") >= 100L && r.getAs[Long]("vec_id") < 400L)
    assert(fam.length == 300)
    val keeper = fam.filter(_.getAs[Int]("kept") == 1)
    assert(keeper.map(_.getAs[Long]("vec_id")).toSeq == Seq(100L),
      "exactly the min-id family member survives")
    assert(fam.filter(_.getAs[Long]("vec_id") > 100L)
      .forall(_.getAs[Long]("representative") == 100L),
      "every other family member collapses onto the min id")
  }
}
