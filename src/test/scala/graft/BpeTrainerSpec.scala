package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

/** The distributed BPE trainer vs an INDEPENDENT in-memory reference
  * (standard Sennrich BPE: word-frequency table, weighted pair counts,
  * deterministic argmax on (count desc, left, right), greedy
  * non-overlapping left-to-right merge application). The engine must
  * reproduce the reference's merge SEQUENCE and per-merge counts exactly
  * — any drift in the fold's greedy semantics (the 'aaa'/'abab' overlap
  * cases), the tie-break, or the weighting breaks it. Run on both driver
  * corpora so the merges differ between fixtures (non-vacuous).
  */
class BpeTrainerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bpe-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference BPE: pure Scala, no Spark. */
  private def refTrain(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.flatMap(t => "[a-z0-9]+".r.findAllIn(t.toLowerCase))
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1)
    var table: Seq[(Vector[String], Long)] =
      wf.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (k <- 1 to n) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((v, f) <- table; i <- 0 until v.length - 1)
        cnt((v(i), v(i + 1))) = cnt.getOrElse((v(i), v(i + 1)), 0L) + f
      if (cnt.nonEmpty) {
        val ((x, y), c) = cnt.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((k, x, y, c))
        table = table.map { case (v, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < v.length) {
            if (i + 1 < v.length && v(i) == x && v(i + 1) == y) { b += x + y; i += 2 }
            else { b += v(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  for (sf <- Seq("sf0.001", "sf0.01"))
    test(s"engine merges == reference BPE on $sf (15 rounds)") {
      val dir = s"/root/testdata/$sf"
      val texts = graft.core.Tables(spark, dir, "documents")
        .select("text").collect().map(_.getString(0)).toSeq
      val expected = refTrain(texts, 15)
      val got = BpeTrainer.train(spark, dir, 15)
        .map(m => (m.rank, m.left, m.right, m.n_occurrences))
      graft.core.CachedRdds.drain()
      assert(got == expected)
      // multichar merges must appear by round 15 (the recursive case:
      // a later merge consumes an earlier merge's output token)
      assert(expected.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
        "fixture produced only char-char merges — recursion untested")
    }

  /** Reference encoder: rank-ordered merge application, greedy
    * non-overlapping scan per merge (same contract as training).
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var v = word.map(_.toString).toVector
    for ((x, y) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == x && v(i + 1) == y) { b += x + y; i += 2 }
        else { b += v(i); i += 1 }
      }
      v = b.result()
    }
    v
  }

  test("q_c34 encoded counts == reference encoder on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.core.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val refMerges = refTrain(texts.values.toSeq, 15).map { case (_, l, r, _) => (l, r) }
    val out = SparkEntry.queries("q_c34_bpe_encode")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    assert(out.length == texts.size)
    out.foreach { row =>
      val words = "[a-z0-9]+".r.findAllIn(texts(row.getLong(0)).toLowerCase).toSeq
      val expTokens = words.map(w => refEncode(w, refMerges).length.toLong).sum
      assert(row.getAs[Long]("n_words") == words.length.toLong)
      assert(row.getAs[Long]("n_bpe_tokens") == expTokens,
        s"doc ${row.getLong(0)}: engine ${row.getAs[Long]("n_bpe_tokens")} vs ref $expTokens")
    }
    // non-vacuous: training must actually compress (tokens < chars)
    assert(out.exists(r => r.getAs[Long]("n_bpe_tokens") < r.getAs[Long]("n_chars")))
  }

  /** Reference dropout encoder: same merge list, same per-(word, rank)
    * LCG skip rule as [[graft.functions.BpeEncodeTokens]].
    */
  private def refEncodeDropout(word: String, merges: Seq[(String, String)],
      permille: Int, seed: Long): Int = {
    val wh = word.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    var v = word.map(_.toString).toVector
    for (((x, y), idx) <- merges.zipWithIndex) {
      val rank = idx + 1
      val draw = ((wh * 1103515245L + 12345L + rank * 2654435761L + seed) % 1000L + 1000L) % 1000L
      if (draw >= permille) {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < v.length) {
          if (i + 1 < v.length && v(i) == x && v(i + 1) == y) { b += x + y; i += 2 }
          else { b += v(i); i += 1 }
        }
        v = b.result()
      }
    }
    v.length
  }

  test("q_c35 dropout counts == reference; dropout only ever inflates") {
    val dir = "/root/testdata/sf0.001"
    val texts = graft.core.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val refMerges = refTrain(texts.values.toSeq, 15).map { case (_, l, r, _) => (l, r) }
    val out = SparkEntry.queries("q_c35_bpe_dropout")(spark, dir).collect()
    graft.core.CachedRdds.drain()
    out.foreach { row =>
      val words = "[a-z0-9]+".r.findAllIn(texts(row.getLong(0)).toLowerCase).toSeq
      val expDrop = words.map(w => refEncodeDropout(w, refMerges, 100, 7L).toLong).sum
      assert(row.getAs[Long]("n_tokens_dropout") == expDrop,
        s"doc ${row.getLong(0)}: dropout count mismatch")
      assert(row.getAs[Long]("n_tokens_dropout") >= row.getAs[Long]("n_tokens_det"),
        "skipping merges can only leave more tokens")
    }
    // regularization must actually fire somewhere at p=10%
    assert(out.exists(r =>
      r.getAs[Long]("n_tokens_dropout") > r.getAs[Long]("n_tokens_det")))
  }
}
