package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exactness gate for the PPJoin positional filter inside AllPairs candidate
  * generation (round 12): the filter prunes candidate-join rows using only an
  * overlap UPPER BOUND derived from the matched token's sorted positions, so
  * the surviving pair set — after the exact verify join — must be
  * bit-identical to a naive brute-force Jaccard over the same sets.
  *
  * The corpus oracles (q_b6/q_c3 hash-exact vs DuckDB) already cover the
  * driver distributions; this spec adds a seeded RANDOM fixture with heavy
  * size skew and shared-vocabulary saturation, the regime where the
  * positional bound is tightest (matches deep in a large doc's prefix
  * against a small doc) and an off-by-one in the integer arithmetic would
  * drop a borderline pair. Both q_b6 (τ=0.5, word shingles) and q_c3
  * (τ=0.6, char 5-grams blocked by source) run against an in-process
  * brute-force of their documented semantics.
  */
class PpJoinParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ppjoin-parity-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-ppjoin").toString
    writeFixture()
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
  }

  /** 120 docs over a 12-word vocabulary (dense shingle collisions), text
    * lengths 3–60 words with a few near-duplicate families: edits of a base
    * doc at varying distance so pairs land on BOTH sides of each τ.
    */
  private def writeFixture(): Unit = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 80).foreach { _ =>
      val n = 3 + rnd.nextInt(58)
      texts += Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // 10 families of (base, 3 edits): replace 1..6 random words
    (0 until 10).foreach { _ =>
      val n = 12 + rnd.nextInt(40)
      val base = Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
      texts += base.mkString(" ")
      (0 until 3).foreach { _ =>
        val t = base.clone()
        (0 until 1 + rnd.nextInt(6)).foreach { _ =>
          t(rnd.nextInt(n)) = vocab(rnd.nextInt(vocab.length))
        }
        texts += t.mkString(" ")
      }
    }
    val sources = Array("s0", "s1", "s2")
    texts.toSeq.zipWithIndex.map { case (t, i) =>
      (i.toLong, sources(i % sources.length), t, "en")
    }.toDF("doc_id", "source", "text", "lang")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def loaded(): Seq[(Long, String, String)] = {
    val s = spark
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq.sortBy(_._1)
  }

  private def jaccardPairs(
      sets: Seq[(Long, Set[String])], tau10: Int): Set[(Long, Long, Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      shared = (sa & sb).size.toLong
      uni = sa.size.toLong + sb.size.toLong - shared
      if shared * 10 >= uni * tau10
    } yield (ia, ib, shared, uni)).toSet

  test("q_b6 (word shingles, tau=0.5) matches brute force on the skewed fixture") {
    val docs = loaded()
    val sets = docs.map { case (id, _, t) =>
      val toks = t.toLowerCase.split(" ", -1)
      val sh = if (toks.length >= 3)
        (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
      else Set.empty[String]
      (id, sh)
    }.filter(_._2.nonEmpty)
    val expected = jaccardPairs(sets, tau10 = 5)
    val got = SparkEntry.queries("q_b6_jaccard_neardup")(spark, dir)
      .select("doc_a", "doc_b", "shared", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty, "vacuous fixture: no qualifying q_b6 pairs")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("q_c3 (char 5-grams by source, tau=0.6) matches brute force on the skewed fixture") {
    val docs = loaded()
    val sets = docs.collect { case (id, src, t) if t.length >= 5 =>
      (id, src, (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet)
    }
    val expected = (for {
      (ia, sa, ga) <- sets; (ib, sb, gb) <- sets
      if ia < ib && sa == sb
      shared = (ga & gb).size.toLong
      uni = ga.size.toLong + gb.size.toLong - shared
      if shared * 10 >= uni * 6
    } yield (ia, ib, shared, uni)).toSet
    val got = SparkEntry.queries("q_c3_ngram_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty, "vacuous fixture: no qualifying q_c3 pairs")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
