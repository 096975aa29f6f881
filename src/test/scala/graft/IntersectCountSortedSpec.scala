package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IntersectCountSorted

class IntersectCountSortedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ics-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    IntersectCountSorted.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("merge count equals size(array_intersect) on sorted distinct arrays") {
    val rows = spark.sql(
      """SELECT intersect_count_sorted(a, b) AS fast,
        |       CAST(size(array_intersect(a, b)) AS BIGINT) AS ref
        |FROM VALUES
        |  (array('a','b','c'), array('b','c','d')),
        |  (array('a'), array('b')),
        |  (array(), CAST(array() AS ARRAY<STRING>)),
        |  (array('x','y','z'), array('x','y','z')),
        |  (array('ab','cd'), array('ab','ce','zz')) AS t(a, b)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("randomized agreement with array_intersect (seeded)") {
    val rnd = new scala.util.Random(13)
    val cases = Seq.fill(50) {
      def arr() = rnd.shuffle((0 until 200).toList).take(rnd.nextInt(60))
        .map(i => f"g$i%03d").distinct.sorted
      (arr(), arr())
    }
    val sp = spark
    import sp.implicits._
    val df = cases.toDF("a", "b").selectExpr(
      "intersect_count_sorted(a, b) AS fast",
      "CAST(size(array_intersect(a, b)) AS BIGINT) AS ref")
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("long arrays: merge count agrees with array_intersect") {
    val rows = spark.sql(
      """SELECT intersect_count_sorted(a, b) AS fast,
        |       CAST(size(array_intersect(a, b)) AS BIGINT) AS ref
        |FROM VALUES
        |  (array(1L,5L,9L), array(5L,9L,10L)),
        |  (array(1L), array(2L)),
        |  (array(3L,4L,5L), array(3L,4L,5L)) AS t(a, b)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("int arrays: merge count agrees with array_intersect") {
    val rows = spark.sql(
      """SELECT intersect_count_sorted(a, b) AS fast,
        |       CAST(size(array_intersect(a, b)) AS BIGINT) AS ref
        |FROM VALUES
        |  (array(1,5,9), array(5,9,10)),
        |  (array(1), array(2)),
        |  (array(-3,0,7), array(-3,7,8)),
        |  (array(3,4,5), array(3,4,5)) AS t(a, b)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("rejects mismatched or unsupported argument types") {
    intercept[Exception] {
      spark.sql("SELECT intersect_count_sorted(array(1), array(2L))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT intersect_count_sorted(array('a'), array(1L))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT intersect_count_sorted(array(1.5), array(2.5))").collect()
    }
  }
}
