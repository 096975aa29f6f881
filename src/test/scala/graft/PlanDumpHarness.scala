package graft

/** Optimization-round harness: dump `.explain("formatted")` for registered
  * queries to files (the judge-checkable plan receipts under plans/rN/).
  *
  *   sbt "Test/runMain graft.PlanDumpHarness <sfDir> <outDir> <suffix> [q1,q2,...]"
  *
  * Plans are built (artifact-building queries run their build jobs) but the
  * query itself is NOT executed — the dump is the analyzed/physical plan
  * before AQE re-planning, exactly what `df.explain("formatted")` prints.
  */
object PlanDumpHarness {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').toSet) else None
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        val nEx = "Exchange".r.findAllIn(txt).length
        println(s"[plandump] $name exchanges=$nEx chars=${txt.length}")
      } catch {
        case e: Throwable =>
          println(s"[plandump] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      graft.core.CachedRdds.drain()
    }
    spark.stop()
  }
}
