package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c41 perceptual-hash media near-dup: the aHash of each REAL decoded
  * PNG must equal the closed-form generator hash (an independent Scala
  * computation here — proving the encode→decode→resample→threshold
  * chain), planted families must actually collapse onto one signature,
  * and the singleton third must stay singleton.
  */
class MediaNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-medianeardup-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Independent closed-form aHash from the generator arithmetic. */
  private def refHash(id: Long): String = {
    val base = if ((id / 8) % 3 == 0) id * 1000003L + 500000009L else id / 8
    val w = (base % 56 + 8).toInt
    val h = (base % 40 + 8).toInt
    val v = for (y <- 0 until 8; x <- 0 until 8) yield {
      val sx = x * w / 8
      val sy = y * h / 8
      val noise = if ((sx * 31L + sy * 17L + id * 13L) % 149L == 0L) 1 else 0
      ((base * 31 + sx * 7 + sy * 13 + noise) % 256).toInt
    }
    val sum = v.map(_.toLong).sum
    v.map(p => if (p * 64L > sum) '1' else '0').mkString
  }

  test("q_c41 decoded-pixel hashes equal the closed-form reference per id") {
    val got = SparkEntry.queries("q_c41_media_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    for ((id, ahash, _, _, _) <- got)
      assert(ahash == refHash(id), s"id $id: decode-path hash != generator hash")

    // planted families (same id div 8, non-singleton blocks) must
    // mostly collapse onto one signature
    val famIds = got.map(_._1).filter(id => (id / 8) % 3 != 0).groupBy(_ / 8)
      .filter(_._2.length >= 2)
    assert(famIds.nonEmpty, "fixture has no multi-member families")
    val hashOf = got.map(r => r._1 -> r._2).toMap
    val collapsed = famIds.count { case (_, ids) => ids.map(hashOf).distinct.length == 1 }
    assert(collapsed.toDouble / famIds.size > 0.6,
      s"only $collapsed/${famIds.size} planted families collapsed")

    // both verdicts occur, and singletons dominate the unique third
    val uniq = got.filter(r => (r._1 / 8) % 3 == 0)
    assert(uniq.nonEmpty && got.exists(_._5 == 1L))
    assert(uniq.count(_._5 == 0L).toDouble / uniq.length > 0.8,
      "unique images spuriously clustered")

    // rep_id is the family minimum
    for ((id, ahash, n, rep, _) <- got) {
      val members = got.filter(_._2 == ahash).map(_._1)
      assert(n == members.length.toLong && rep == members.min, s"id $id family stats")
    }
  }
}
