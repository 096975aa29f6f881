package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Manual perf harness (NOT a spec): per-pass stage-metric attribution for
  * the memo disk tier (round-13 lead 3). Runs q_c3 twice with the memo
  * forced over budget (maxBytes=64 MB -> garr takes the disk tier) and
  * reports, for each pass, total executor run time vs shuffle read/write
  * bytes vs input bytes — the numbers that decide whether the spill-serve
  * pass is SHUFFLE-bound (a sorted/bucketed spill would pay) or
  * job-overhead/compute-bound (it would not).
  *
  *   sbt "Test/runMain graft.MemoProfileHarness /tmp/scale10"
  */
object MemoProfileHarness {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/scale10")
    val spark = graft.core.GraftSession.local()
    spark.conf.set("spark.graft.memo.maxBytes", (64L << 20).toString)
    val stages = mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages += ((sc.stageInfo.stageId, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, m.executorCpuTime / 1000000L))
      }
    })
    def runPass(tag: String): Unit = {
      val mark = stages.size
      val t0 = System.nanoTime()
      SparkEntry.queries("q_c3_ngram_jaccard")(spark, sf)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkTestAccess.drainListenerBus(spark.sparkContext, 30000)
      val ps = stages.drop(mark)
      println(f"[memoprof] $tag: wall $wall%.1f s, ${ps.size} stages, " +
        f"execRun ${ps.map(_._2).sum / 1000.0}%.1f s, cpu ${ps.map(_._6).sum / 1000.0}%.1f s, " +
        f"shufRead ${ps.map(_._3).sum / 1e6}%.1f MB, shufWrite ${ps.map(_._4).sum / 1e6}%.1f MB, " +
        f"input ${ps.map(_._5).sum / 1e6}%.1f MB")
      ps.sortBy(-_._2).take(6).foreach { case (id, rt, sr, sw, in, cpu) =>
        println(f"[memoprof]   stage $id: execRun ${rt / 1000.0}%.1f s cpu ${cpu / 1000.0}%.1f s " +
          f"shufRead ${sr / 1e6}%.1f MB shufWrite ${sw / 1e6}%.1f MB input ${in / 1e6}%.1f MB")
      }
      graft.core.CachedRdds.drain()
    }
    runPass("passA (build+spill)")
    runPass("passB (spill-serve)")
    spark.stop()
  }
}
