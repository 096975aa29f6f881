package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries

/** Non-vacuous verification of the hyperplane-LSH near-dup blocker.
  *
  * q_c4's τ=0.90 threshold can never fire on the driver corpus (max
  * same-label cosine ≈ 0.51), so its oracle pass proves nothing about the
  * blocking. Here we PLANT near-duplicate vectors — perturbed copies whose
  * cosine to their original lands in [0.90, 1.0) — and assert the
  * LSH-blocked plan's output is IDENTICAL to the naive all-pairs join on
  * ≥ 10 non-empty pairs, including pairs close to the threshold.
  */
class LshPlantedPairsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-lsh-planted-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("LSH-blocked pairs == naive all-pairs on planted near-dups") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // 40 base vectors; each gets a perturbed twin v' = normalize(v + eps*g)
    // with eps ramping so the planted cosines spread across ~[0.88, 1.0) —
    // some pairs land just above and some just below the threshold.
    val bases = (0 until 40).map(i => (i.toLong, unit()))
    val twins = bases.map { case (i, v) =>
      val eps = 0.05 + 0.45 * (i.toDouble / 39.0)
      val g = Array.fill(dim)(rnd.nextGaussian())
      val p = v.indices.map(j => v(j) + eps * g(j) / math.sqrt(dim.toDouble)).toArray
      val n = math.sqrt(p.map(x => x * x).sum)
      (i + 1000L, p.map(_ / n))
    }
    val rows = (bases ++ twins).map { case (id, v) => (id, "L0", v.toSeq) }
    val e = rows.toDF("vec_id", "label", "v")

    val lsh = SimilarityQueries
      .lshCosinePairs(s, e, tau = 0.90, bands = 16, rBits = 4, seed = 42L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .toSet

    graft.functions.CosineSimilarity.register(s)
    val naive = e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(expr("CAST(cosine_similarity(a.v, b.v) AS DECIMAL(18,6))"), 4)
          .as("cos_sim"))
      .filter(col("cos_sim") >= 0.90)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
      .toSet

    assert(naive.size >= 10, s"planting failed: only ${naive.size} naive pairs")
    assert(naive.size < 40, s"planting too easy: all ${naive.size} pairs passed")
    assert(lsh === naive)
  }
}
