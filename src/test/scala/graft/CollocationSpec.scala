package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c77 — PMI measures what it claims on a corpus where the strongest
  * collocation is known by construction: a bigram whose words appear
  * ONLY together must out-score pairs of independently frequent words
  * (the DuckDB oracle proves engine parity; this proves semantics).
  */
class CollocationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-collocation-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-colloc").toString
    val s = spark
    import s.implicits._
    // "quantum entanglement" always adjacent; filler words are frequent
    // but combine with MANY different neighbors, diluting their PMI.
    val fill = Seq("the", "data", "set", "holds", "many", "common", "words",
      "that", "appear", "everywhere")
    val docs = (0 until 12).map { i =>
      val shuffled = (0 until 10).map(j => fill((i * 3 + j * 7) % 10)).mkString(" ")
      (i.toLong, s"$shuffled quantum entanglement $shuffled")
    }
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.core.LocalArtifacts.deleteRecursively(dir)
  }

  test("q_c77: the planted exclusive bigram is the top collocation") {
    val rows = SparkEntry.queries("q_c77_pmi_collocations")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    assert(rows.head.getString(0) === "quantum" && rows.head.getString(1) === "entanglement",
      "words that only ever co-occur must carry the highest PMI")
    // output invariants: prune respected, ranking monotone
    assert(rows.forall(_.getLong(2) >= 5L), "pair_cnt prune")
    val pmis = rows.map(_.getDouble(3))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "pmi descending")
  }
}
