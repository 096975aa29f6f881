package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (fast iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      graft.core.CachedRdds.drain()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // External-reader proof: when the phrase search was dumped, record
    // the stored index's on-disk location so the DuckDB side can
    // reproduce q_c103 FROM THE ARTIFACT FILES ALONE (no corpus view) —
    // the engine-neutrality claim for the stored-index family. Serving
    // from the StoredArtifact cache here costs no rebuild: q_c103's dump
    // above already built it for this (dir, snapshot) key.
    val idxEntries = Seq(
      "q_c103_phrase_search" -> ("phrase_index",
        () => graft.operators.TextQueries.phraseIndex(spark, sfDir)),
      "q_c45_bm25_stored" -> ("bm25_index",
        () => graft.operators.TextQueries.postingsIndex(spark, sfDir)),
      "q_c66_minhash_stored" -> ("minhash_index",
        () => graft.operators.DedupQueries.minhashIndex(spark, sfDir)),
      "q_c131_ivf_stage1" -> ("ivf_index",
        () => graft.operators.SimilarityQueries.int8CompactedIndex(
          spark, graft.operators.SimilarityQueries.int8SegmentsIndex(spark, sfDir))),
      "q_c133_segment_retirement" -> ("bm25_segments",
        () => {
          val seg = graft.operators.TextQueries.bm25SegmentsIndex(spark, sfDir)
          val comp = graft.operators.TextQueries.bm25CompactedIndex(spark, seg)
          s"$seg $comp" // "<segments> <compacted>", space-joined (temp paths are space-free)
        })
    ).collect {
      // both conditions: the query must have been SELECTED this run (a
      // subset re-run into a reused outDir must not rebuild indexes it
      // never asked for, nor pair fresh index paths with stale dumps)
      // and its dump must exist (the dump may have failed)
      case (qn, (key, path))
          if only.forall(_.contains(qn))
            && Files.exists(Paths.get(s"$outDir/$qn")) =>
        s"${q(key)}: ${q(path())}"
    }
    if (idxEntries.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/index_paths.json"),
        idxEntries.mkString("{", ",", "}"))
    spark.stop()
  }
}
