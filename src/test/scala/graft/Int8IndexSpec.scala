package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityQueries

/** Round-13 stored int8 IVF index: three claims, each pinned.
  *  1. `pack_int8` bytes == the in-expression derived quantization
  *     (`CAST(round(x*127/greatest(mx,1e-12)) AS INT)`) element-for-
  *     element on every sf0.001 vector — including the negative-tie
  *     HALF_UP rounding Spark's round() applies.
  *  2. Search over the STORED index returns exactly the rows of the
  *     derived-q8 rerank search (same centroids, same nprobe): the
  *     fused Int8CosineQ reproduces the HOF accumulation order, so
  *     stage-1 scores are bit-identical and candidate sets cannot drift.
  *  3. The byte claim is MEASURED, not asserted: the q8 column's parquet
  *     footprint (compressed column-chunk bytes) must be well under half
  *     of the float embedding column it replaces in the stage-1 scan.
  */
class Int8IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-int8index-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pack_int8 == derived int quantization on every sf0.001 vector") {
    graft.functions.Int8Ops.register(spark)
    val e = SimilarityQueries.ivfCorpus(spark, sf)
    val both = e
      .withColumn("mx", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("derived",
        expr("transform(v, x -> CAST(round(x * 127 / greatest(mx, 1e-12D)) AS INT))"))
      .withColumn("packed", expr("pack_int8(v)"))
      .select(col("vec_id"), col("derived"), col("packed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val derived = r.getSeq[Int](1).map(_.toByte)
      val packed = r.getAs[Array[Byte]](2)
      assert(packed.toSeq == derived,
        s"quantization mismatch for vec ${r.getLong(0)}")
    }
  }

  test("stored-index search == derived rerank search (identical rows)") {
    graft.functions.CosineSimilarity.register(spark)
    val e = graft.core.CachedRdds.registerDf(SimilarityQueries.ivfCorpus(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val (fn, nprobe) = SimilarityQueries.trainIvf(spark, e)
    val idx = Files.createTempDirectory("int8idx").toString + "/index"
    SimilarityQueries.buildInt8Index(spark, e, fn, idx)
    val derived = SimilarityQueries.ivfSearchRerank(e, fn, nprobe)
      .collect().map(_.toString).toSeq
    val stored = SimilarityQueries.ivfSearchStored(spark, idx, e, fn, nprobe)
      .collect().map(_.toString).toSeq
    assert(derived.nonEmpty && stored == derived)
    graft.core.CachedRdds.drain()
  }

  test("int8_cos_qq error stays under the 4*sqrt(d)/254 prefilter bound") {
    graft.functions.Int8Ops.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // random pairs plus near-dup pairs (perturbed copies) at several dims:
    // the LSH prefilter's soundness rests entirely on this bound
    val dims = Seq(8, 64, 384)
    val rows = dims.flatMap { d =>
      (0 until 200).map { i =>
        val a = Array.fill(d)(rnd.nextGaussian())
        val b =
          if (i % 2 == 0) Array.fill(d)(rnd.nextGaussian())
          else a.map(x => x + 0.05 * rnd.nextGaussian())
        (a.toSeq, b.toSeq, d)
      }
    }
    val out = rows.toDF("a", "b", "d")
      .selectExpr(
        "d",
        "int8_cos_qq(pack_int8(a), pack_int8(b)) AS c8",
        """aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, z) -> acc + z)
          | / (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
          |    * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x))) AS c""".stripMargin)
      .collect()
    out.foreach { r =>
      val bound = 4.0 * math.sqrt(r.getAs[Int]("d").toDouble) / 254.0
      val err = math.abs(r.getAs[Double]("c8") - r.getAs[Double]("c"))
      assert(err <= bound, s"dim ${r.getAs[Int]("d")}: |cos8-cos| $err > bound $bound")
    }
  }

  test("q8 column bytes are well under half of the float embedding column") {
    graft.functions.CosineSimilarity.register(spark)
    val e = SimilarityQueries.ivfCorpus(spark, sf)
    val (fn, _) = SimilarityQueries.trainIvf(spark, e)
    val idx = Files.createTempDirectory("int8idx2").toString + "/index"
    SimilarityQueries.buildInt8Index(spark, e, fn, idx)
    def columnBytes(dir: String, colName: String): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet"))
        else Array(p)
      files.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString.startsWith(colName))
          .map(_.getTotalSize).sum
        finally reader.close()
      }.sum
    }
    val q8Bytes = columnBytes(idx, "q8")
    val floatBytes = columnBytes(s"$sf/embeddings.parquet", "embedding")
    assert(q8Bytes > 0 && floatBytes > 0)
    // raw ratio is 1:4 (1-byte codes vs float32); parquet encodings keep
    // the stored column comfortably under half
    assert(q8Bytes.toDouble / floatBytes < 0.5,
      s"q8=$q8Bytes B vs float=$floatBytes B — stage-1 byte claim not met")
    info(f"q8 column: $q8Bytes B; float embedding column: $floatBytes B; " +
      f"ratio ${q8Bytes.toDouble / floatBytes}%.3f")
  }
}
