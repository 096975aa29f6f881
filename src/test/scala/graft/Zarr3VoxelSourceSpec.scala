package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry.Shape3
import graft.plans.ImarisToZarr

/** `zarr3voxels` DSv2 reader: a converted level as a SQL-queryable voxel
  * table, with coordinate-range shard pruning and column pruning.
  */
class Zarr3VoxelSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import Fixtures.v

  private var spark: SparkSession = _
  private var level0: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-zarr3voxels-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = Files.createTempDirectory("zarr3vox").toString
    ImarisToZarr.convert(
      spark, s"${Fixtures.dir}/ims_64.ims", out,
      ImarisToZarr.Settings(
        shard = Shape3(32, 32, 32), chunk = Shape3(16, 16, 16),
        translatePyramid = false, computeLevels = 1))
    level0 = s"$out/ims_64.ome.zarr/0"
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("full scan exposes every voxel with exact values") {
    val df = spark.read.format("zarr3voxels").load(level0)
    assert(df.count() == 64L * 64 * 64)
    // one partition per shard (2x2x2 grid)
    assert(df.rdd.getNumPartitions == 8)
    val probe = df.where("z = 17 AND y = 33 AND x = 5").collect()
    assert(probe.length == 1)
    assert(probe.head.getAs[Int]("v") == (v(17, 33, 5) & 0xffff))
  }

  test("z-range predicate prunes non-overlapping shards") {
    val df = spark.read.format("zarr3voxels").load(level0)
      .where("z >= 40 AND z <= 50")
    // only the 4 shards of the second z-slab survive planning
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 11L * 64 * 64)
    // point probe inside the slab still exact
    val r = df.where("y = 0 AND x = 0 AND z = 40").collect()
    assert(r.head.getAs[Int]("v") == (v(40, 0, 0) & 0xffff))
  }

  test("aggregate over pruned columns: SELECT sum(v) matches direct read") {
    val df = spark.read.format("zarr3voxels").load(level0)
    val got = df.selectExpr("sum(v)").head.getLong(0)
    var want = 0L
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      want += (v(z, y, x) & 0xffff)
    assert(got == want)
  }

  test("declarative downsample over the voxel table matches the native kernel") {
    // the A1 windowed spatial reduce, written as plain SQL over the DSv2
    // voxel table — GROUP BY (z DIV 2, y DIV 2, x DIV 2) IS the 2x2x2
    // mean pyramid step, and must agree with Downsample.reduce("mean")
    spark.read.format("zarr3voxels").load(level0).createOrReplaceTempView("vox0")
    val sqlDown = spark.sql(
      """SELECT z DIV 2 AS dz, y DIV 2 AS dy, x DIV 2 AS dx,
        |       CAST(SUM(v) / COUNT(*) AS INT) AS dv
        |FROM vox0 GROUP BY 1, 2, 3""".stripMargin)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getInt(3)))
      .toMap
    val src = new Array[Short](64 * 64 * 64)
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      src((z * 64 + y) * 64 + x) = v(z, y, x)
    val want = graft.plans.Downsample.reduce(
      src, Shape3(64, 64, 64), Shape3(32, 32, 32), Shape3(2, 2, 2), "mean")
    for (z <- 0L until 32; y <- 0L until 32; x <- 0L until 32)
      assert(sqlDown((z, y, x)) == (want(((z * 32 + y) * 32 + x).toInt) & 0xffff),
        s"($z,$y,$x)")
  }

  test("SQL over a registered voxel view") {
    spark.read.format("zarr3voxels").load(level0).createOrReplaceTempView("vox")
    val rows = spark.sql(
      "SELECT z, COUNT(*) AS n, MAX(v) AS mx FROM vox WHERE z < 2 GROUP BY z ORDER BY z")
      .collect()
    assert(rows.length == 2 && rows.forall(_.getLong(1) == 64L * 64))
  }
}
