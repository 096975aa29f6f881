package graft

/** Manual harness: print q_c3's executed plan (post-AQE) at a given SF. */
object Qc3PlanHarness {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/scale10")
    val spark = graft.core.GraftSession.local()
    spark.conf.set("spark.graft.memo.maxBytes", (64L << 20).toString)
    val df = SparkEntry.queries("q_c3_ngram_jaccard")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println("=== EXECUTED PLAN ===")
    println(df.queryExecution.executedPlan.toString.take(14000))
    spark.stop()
  }
}
