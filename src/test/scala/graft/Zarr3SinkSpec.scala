package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry.Shape3
import graft.plans.ZarrRegion

/** The full conversion as one declarative DataFrame pipeline:
  * read.format("imaris") → write.format("zarr3") → voxel-exact readback.
  */
class Zarr3SinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-zarr3-sink-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("imaris source → zarr3 sink round-trips voxel-exactly (declarative W4 pipeline)") {
    val out = Files.createTempDirectory("zarr3sink").toString
    spark.read.format("imaris")
      .option("path", s"${Fixtures.dir}/ims_64.ims")
      .option("shard", "32,32,32")
      .load()
      .filter(col("level") === 0)
      .select("sz", "sy", "sx", "z0", "z1", "y0", "y1", "x0", "x1", "data")
      .write.format("zarr3")
      .option("path", s"$out/0")
      .option("shape", "64,64,64")
      .option("shard", "32,32,32")
      .option("chunk", "16,16,16")
      .mode("append")
      .save()
    // driver wrote the level metadata before tasks ran
    val meta = new String(graft.sinks.ZarrV3.read(
      spark.sparkContext.hadoopConfiguration, s"$out/0/zarr.json"), "UTF-8")
    assert(meta.contains(""""shape":[1,1,64,64,64]"""))
    val data = ZarrRegion.read(spark.sparkContext.hadoopConfiguration, s"$out/0",
      Shape3(64, 64, 64), Shape3(32, 32, 32), Shape3(16, 16, 16), 0, 64, 0, 64, 0, 64)
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      assert(data((z * 64 + y) * 64 + x) == Fixtures.v(z, y, x))
  }

  test("mode(overwrite) truncates: stale shards from a previous grid are deleted") {
    val out = Files.createTempDirectory("zarr3trunc").toString
    val conf = spark.sparkContext.hadoopConfiguration
    def writeGrid(shard: String, mode: String): Unit =
      spark.read.format("imaris")
        .option("path", s"${Fixtures.dir}/ims_64.ims")
        .option("shard", shard)
        .load()
        .filter(col("level") === 0)
        .select("sz", "sy", "sx", "z0", "z1", "y0", "y1", "x0", "x1", "data")
        .write.format("zarr3")
        .option("path", s"$out/0")
        .option("shape", "64,64,64")
        .option("shard", shard.replaceAll(" ", ""))
        .option("chunk", "16,16,16")
        .mode(mode)
        .save()
    // 16-cube grid → 64 shard files (c/0/... keys)
    writeGrid("16,16,16", "append")
    // reshape to 32-cube grid with overwrite → 8 shard files; the 64
    // old ones must be GONE, not just overwritten where coordinates
    // coincide
    writeGrid("32,32,32", "overwrite")
    val files = {
      val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(conf)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$out/0"), true)
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) b += it.next().getPath.toString
      b.toSeq
    }
    val shardFiles = files.filterNot(_.endsWith("zarr.json"))
    assert(shardFiles.length == 8, s"stale shards survived: ${shardFiles.length}")
    val data = ZarrRegion.read(conf, s"$out/0",
      Shape3(64, 64, 64), Shape3(32, 32, 32), Shape3(16, 16, 16), 0, 64, 0, 64, 0, 64)
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      assert(data((z * 64 + y) * 64 + x) == Fixtures.v(z, y, x))
  }

  test("sink rejects input missing required columns") {
    val sp = spark
    import sp.implicits._
    intercept[Exception] {
      Seq((1L, 2L)).toDF("sz", "sy").write.format("zarr3")
        .option("path", "/tmp/never").option("shape", "8,8,8")
        .option("shard", "8,8,8").option("chunk", "8,8,8").mode("append").save()
    }
  }
}
