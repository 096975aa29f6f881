package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupQueries

/** The AllPairs rarity dictionary ([[DedupQueries.rarityIds]]): dense ids
  * 0..V-1 in ascending (frequency, key) order, INT-typed when the
  * vocabulary fits the threshold with a BIGINT fallback that must assign
  * the SAME ranks — the fallback is otherwise dead code at fixture scale,
  * so the spec forces it via the `intMaxVocab` seam.
  */
class RarityIdsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rarityids-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def keyedFixture() = {
    val sp = spark
    import sp.implicits._
    // frequencies: z→1, y→2, x→3, w→3 (ties broken by key: w before x)
    Seq(
      (1L, "x"), (2L, "x"), (3L, "x"),
      (1L, "w"), (2L, "w"), (3L, "w"),
      (1L, "y"), (2L, "y"),
      (1L, "z")
    ).toDF("doc_id", "key")
  }

  private val wantOrder = Seq("z" -> 0L, "y" -> 1L, "w" -> 2L, "x" -> 3L)

  test("int branch: dense 0..V-1 ids in (frequency, key) order") {
    val ids = DedupQueries.rarityIds(spark, keyedFixture())
    assert(ids.schema("gid").dataType == IntegerType)
    val got = ids.collect().map(r => (r.getString(0), r.getInt(1).toLong)).sortBy(_._2)
    assert(got.toSeq == wantOrder)
    graft.core.CachedRdds.drain()
  }

  test("forced BIGINT fallback assigns identical ranks") {
    val ids = DedupQueries.rarityIds(spark, keyedFixture(), intMaxVocab = 0L)
    assert(ids.schema("gid").dataType == LongType)
    val got = ids.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(got.toSeq == wantOrder)
    graft.core.CachedRdds.drain()
  }

  test("empty input yields an empty dictionary (both branches)") {
    val sp = spark
    import sp.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "key")
    assert(DedupQueries.rarityIds(spark, empty).isEmpty)
    assert(DedupQueries.rarityIds(spark, empty, intMaxVocab = 0L).isEmpty)
    graft.core.CachedRdds.drain()
  }
}
