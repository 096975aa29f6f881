package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.operators.SimilarityQueries

/** Manual perf harness (NOT a spec): stored-int8-index measurement at an
  * arbitrary SF dir — index build cost, derived-vs-stored search walls
  * (two passes each), and the stage-1 column bytes.
  *
  *   sbt "Test/runMain graft.Int8MeasureHarness /root/testdata/sf0.1"
  */
object Int8MeasureHarness {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    graft.functions.CosineSimilarity.register(spark)
    val e = SimilarityQueries.ivfCorpus(spark, sf).persist()
    e.count()
    val (fn, nprobe) = SimilarityQueries.trainIvf(spark, e)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[int8] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val idx = java.nio.file.Files.createTempDirectory("int8idx").toString + "/index"
    time("build index")(SimilarityQueries.buildInt8Index(spark, e, fn, idx))
    for (pass <- 1 to 2) {
      time(s"derived rerank pass$pass")(
        SimilarityQueries.ivfSearchRerank(e, fn, nprobe)
          .write.format("noop").mode("overwrite").save())
      time(s"stored  rerank pass$pass")(
        SimilarityQueries.ivfSearchStored(spark, idx, e, fn, nprobe)
          .write.format("noop").mode("overwrite").save())
    }
    def columnBytes(dir: String, colName: String): Long = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val files = if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      else Array(p)
      files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString.startsWith(colName)).map(_.getTotalSize).sum
        finally r.close()
      }.sum
    }
    println(s"[int8] q8 bytes=${columnBytes(idx, "q8")} " +
      s"float bytes=${columnBytes(s"$sf/embeddings.parquet", "embedding")}")
    spark.stop()
  }
}
