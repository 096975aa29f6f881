package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries

/** The wide-dimension escape hatch for q_c9's Lloyd training: past
  * codegen.maxFields (pinned 1024) the per-dim sum-column formulation
  * silently loses whole-stage codegen, so dim > 768 switches to the
  * [[graft.functions.VectorSum]] TypedImperativeAggregate (one
  * Array[Double] buffer per cell, ObjectHashAggregate with map-side
  * partials). This spec pins: the aggregate's exact arithmetic, its
  * ObjectHashAggregate plan mode, and a dim-1536 train+search
  * end-to-end with planted near-copies retrieved at recall 1.0 — the
  * real embedding widths (1536, 3072) a production corpus ships.
  */
class IvfWideDimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-widedim-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vector_sum equals per-dim sums and skips NULL rows") {
    val sp = spark
    import sp.implicits._
    graft.functions.VectorSum.register(sp)
    val df = Seq(
      (0L, Some(Seq(1.0, 2.0, 3.0))),
      (0L, Some(Seq(0.5, -2.0, 4.0))),
      (0L, None),
      (1L, Some(Seq(10.0, 0.0, -1.0)))
    ).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(expr("vector_sum(v)").as("s"))
      .orderBy(col("g"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(got(0) == (0L, Seq(1.5, 0.0, 7.0)))
    assert(got(1) == (1L, Seq(10.0, 0.0, -1.0)))
    // all-NULL group yields NULL, not a zero-width array
    val allNull = Seq((2L, Option.empty[Seq[Double]])).toDF("g", "v")
      .groupBy(col("g")).agg(expr("vector_sum(v)").as("s")).collect()
    assert(allNull.head.isNullAt(1))
  }

  test("vector_sum plans as ObjectHashAggregate (no wide codegen unit)") {
    val sp = spark
    import sp.implicits._
    graft.functions.VectorSum.register(sp)
    val df = Seq((0L, Seq(1.0, 2.0))).toDF("g", "v")
    val plan = df.groupBy(col("g")).agg(expr("vector_sum(v)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"unexpected plan:\n$plan")
  }

  test("dim-1536 IVF trains and retrieves planted near-copies end-to-end") {
    val sp = spark
    import sp.implicits._
    val rnd = new java.util.Random(1536L)
    val dim = 1536
    def randVec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    val base = (0 until 300).map(i => (i.toLong, (i % 3).toLong, randVec()))
    val planted = base.collect { case (id, lab, v) if id % 100 == 0 =>
      (1 to 5).map { j =>
        (10000L + id * 10 + j, lab, v.map(x => x + 0.001 * rnd.nextGaussian()))
      }
    }.flatten
    val e = (base ++ planted).toDF("vec_id", "label", "v")
    graft.functions.CosineSimilarity.register(sp)
    val (fn, nprobe) = SimilarityQueries.trainIvf(sp, e)
    val got = SimilarityQueries.ivfSearch(e, fn, nprobe)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val queries = base.collect { case (id, _, _) if id % 100 == 0 => id }
    assert(queries.nonEmpty)
    queries.foreach { q =>
      val want = (1 to 5).map(j => 10000L + q * 10 + j).toSet
      assert(got.getOrElse(q, Set.empty) == want,
        s"query $q must retrieve its planted near-copies, got ${got.get(q)}")
    }
  }
}
