package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityQueries

/** Manual perf harness (NOT a spec): fat-vs-narrow rerank-tail A/B at an
  * arbitrary embedding width — the measurement behind the round-21
  * narrow-tail decision. At dim 64 (the test fixtures) the narrow form
  * measured SLOWER (PERF.md round 21: broadcast machinery > the ~0.5 KB
  * of qv the windows drag); the claim to check at production widths is
  * that dim ≳ 1536 (12 KB of qv per probed candidate row through two
  * sorts) inverts the trade.
  *
  *   sbt "Test/runMain graft.RerankWidthHarness 1536 4000"
  */
object RerankWidthHarness {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(1536)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val spark = graft.core.GraftSession.local()
    graft.functions.CosineSimilarity.register(spark)
    graft.functions.Int8Ops.register(spark)
    // deterministic spark-side corpus: sin-hash pseudo-noise per component
    val e = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), i -> CAST(sin(id * 2654435761L + i * 40503L) AS DOUBLE))")
          .as("v"))
      .persist()
    println(s"[rerank-width] corpus n=$n dim=$dim rows=${e.count()}")
    val (fn, nprobe) = SimilarityQueries.trainIvf(spark, e)
    val idx = java.nio.file.Files.createTempDirectory("rwidth").toString + "/codes"
    SimilarityQueries.buildInt8Index(spark, e, fn, idx)
    val codes = spark.read.parquet(idx)

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rerank-width] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // FAT: the shipped path
    def fat() = SimilarityQueries.ivfSearchCodes(spark, codes, e, fn, nprobe)

    // NARROW: windows on ids+score only, qv re-joined after the cut —
    // an inline replica of the rejected round-21 rewrite, kept here so
    // the A/B can be re-run at any width without touching the product
    def narrow() = {
      val fetch = 20
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val probes = q.select(col("query_id"), col("qv"),
        explode(expr(s"$fn(qv, $nprobe)")).as("cell"))
      val scored = codes.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("ascore", expr("int8_cos_q(q8, qv)"))
        .select(col("query_id"), col("cell"), col("vec_id"), col("ascore"))
      val wCell = Window.partitionBy(col("query_id"), col("cell"))
        .orderBy(col("ascore").desc, col("vec_id"))
      val wQ = Window.partitionBy(col("query_id"))
        .orderBy(col("ascore").desc, col("vec_id"))
      val cands = scored
        .withColumn("cell_rank", row_number().over(wCell))
        .filter(col("cell_rank") <= fetch)
        .withColumn("arank", row_number().over(wQ))
        .filter(col("arank") <= fetch)
        .select(col("query_id"), col("vec_id"))
        .join(broadcast(q), Seq("query_id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id"))
      cands.join(e.select(col("vec_id"), col("v")), Seq("vec_id"))
        .withColumn("score",
          round(expr("CAST(cosine_similarity(v, qv) AS DECIMAL(18,6))"), 4))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id"),
          col("score").cast("double").as("score"))
        .orderBy(col("query_id"), col("rank"))
    }

    // identical results first (any A/B over different answers is void)
    val a = fat().collect().map(_.toString).toSeq
    val b = narrow().collect().map(_.toString).toSeq
    println(s"[rerank-width] results identical: ${a == b} (${a.size} rows)")
    for (pass <- 1 to 2) {
      time(s"fat    pass$pass")(fat().write.format("noop").mode("overwrite").save())
      time(s"narrow pass$pass")(narrow().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
