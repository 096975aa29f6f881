package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c59 — chunk-grid properties the oracle's value-hash can't express
  * as intent: every token position is covered, consecutive chunks
  * overlap by exactly 16 tokens (stride 112 of size 128), and the
  * is_last flag marks precisely the final chunk of each document.
  */
class DocChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-chunking-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chunks tile every document: full coverage, 16-token overlap, one is_last") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_c59_doc_chunking")(spark, sf).collect()
    val nTokens = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    // every non-empty doc chunks; empty docs don't
    assert(byDoc.keySet === nTokens.filter(_._2 >= 1).keySet)
    byDoc.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_.getLong(1))
      // dense chunk ids, starts on the 112 grid
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong, s"doc $doc chunk ids must be dense")
        assert(r.getLong(2) === i.toLong * 112, s"doc $doc stride must be 112")
      }
      // coverage: the last chunk's end reaches n; every chunk ≤ 128 tokens
      val ends = sorted.map(r => r.getLong(2) + r.getLong(3))
      assert(ends.last === n, s"doc $doc: chunks must cover all $n tokens")
      sorted.foreach(r => assert(r.getLong(3) >= 1 && r.getLong(3) <= 128))
      // overlap: consecutive full chunks share exactly 16 tokens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getLong(2) + a.getLong(3)
          val overlap = aEnd - b.getLong(2)
          if (a.getLong(3) == 128L)
            assert(overlap === 16L, s"doc $doc: full chunks must overlap by 16")
        case _ => ()
      }
      // exactly one is_last, on the final chunk
      assert(sorted.map(_.getInt(4)).sum === 1)
      assert(sorted.last.getInt(4) === 1)
    }
  }
}
