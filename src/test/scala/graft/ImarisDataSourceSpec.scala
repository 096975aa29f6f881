package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 `imaris` source: planning-time pruning + payload column pruning. */
class ImarisDataSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-dsv2-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pyramid = spark.read.format("imaris")
    .option("path", s"${Fixtures.dir}/ims_pyramid.ims")
    .option("shard", "32,32,32")
    .load()

  test("shard-grid rows with correct counts per level") {
    val counts = pyramid.groupBy("level").count().orderBy("level").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    // L0 (64,128,128)/32³ = 2*4*4=32; L1 (32,64,64)→1*2*2=4... with clamping:
    // L1 shard clamped to (32,32,32): grid 1*2*2=4; L2 (16,32,32): shard (16,32,32) → 1
    assert(counts == Seq((0, 32L), (1, 4L), (2, 1L)))
  }

  test("level predicate prunes partitions at planning time") {
    val scan = pyramid.filter(col("level") === 2)
    val rdd = scan.queryExecution.toRdd
    assert(rdd.getNumPartitions == 1, "level=2 must plan exactly 1 input partition")
  }

  test("payload read only when data column survives pruning; voxels exact") {
    // metadata-only projection: no binary in the schema scan
    val meta = pyramid.select("level", "z0", "z1").collect()
    assert(meta.length == 37)
    // full read of the single level-2 shard: voxel-exact vs the formula
    val row = pyramid.filter(col("level") === 2).select("data", "z1", "y1", "x1").collect().head
    val bytes = row.getAs[Array[Byte]](0)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bytes.length == 16 * 32 * 32 * 2)
    for (z <- 0 until 16; y <- 0 until 32; x <- 0 until 32)
      assert(bb.getShort(2 * ((z * 32 + y) * 32 + x)) == Fixtures.v(z, y, x, 2))
  }

  test("pushFilters only claims value types the planner evaluates") {
    import org.apache.spark.sql.sources._
    val b = new graft.sources.ImarisScanBuilder(Map("path" -> "unused"))
    val filters: Array[Filter] = Array(
      EqualTo("level", 0),                    // claimable
      EqualTo("level", java.lang.Long.valueOf(1L)), // Number — claimable
      EqualTo("level", "zero"),               // wrong type → residual
      In("file", Array[Any]("a.ims", 3)),     // mixed types → residual
      StringStartsWith("file", "a"))          // unsupported op → residual
    val rest = b.pushFilters(filters)
    // same instances partitioned — compare by identity
    assert(b.pushedFilters().toSeq.map(System.identityHashCode) ==
      Seq(filters(0), filters(1)).map(System.identityHashCode))
    assert(rest.toSeq.map(System.identityHashCode) ==
      Seq(filters(2), filters(3), filters(4)).map(System.identityHashCode))
  }
}
