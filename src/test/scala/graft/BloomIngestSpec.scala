package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c61 / graft.functions.BloomFilterOps — the Bloom-prefilter
  * guarantees the oracle's value-hash can't express as intent:
  *
  *  - NO FALSE NEGATIVES: every exactly-duplicated incoming document is
  *    bloom-positive (the property the admission verdict's exactness
  *    rests on);
  *  - the codegen'd expression agrees bit-for-bit with an independent
  *    driver-side reimplementation of the double-hashing family;
  *  - false positives are bounded at the deployed geometry;
  *  - the admission verdict is exactly the complement of membership in
  *    the retained corpus (bloom sizing can't leak into the answer);
  *  - the hex-word parser rejects non-hex keys loudly.
  */
class BloomIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bloom-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Independent reference: position set of a hex digest. */
  private def positions(hex: String, m: Int, k: Int): Seq[Int] = {
    val h1 = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(12, 24), 16)
    (0 until k).map(i => ((h1 + i.toLong * h2) % m).toInt)
  }

  test("q_c61: no false negatives, bounded false positives, exact admission") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_c61_bloom_ingest")(spark, sf).collect()
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val retained = docs.collect { case (id, h) if id % 10 != 3 => h }.toSet
    assert(rows.length === docs.count(_._1 % 2 == 1), "one verdict per incoming doc")
    var fp = 0
    rows.foreach { r =>
      val (doc, bloom, dup, admitted) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val isDup = retained.contains(docs(doc))
      assert(dup === (if (isDup) 1L else 0L), s"doc $doc: exact_dup must be ground truth")
      assert(admitted === 1L - dup, s"doc $doc: admission is the exact complement")
      if (isDup) assert(bloom === 1L, s"doc $doc: a Bloom filter must never miss a member")
      if (!isDup && bloom == 1L) fp += 1
    }
    val nonDups = rows.count(_.getLong(2) == 0L)
    assert(nonDups > 0 && rows.length > nonDups, "fixture exercises both verdicts")
    assert(fp.toDouble <= 0.05 * nonDups,
      s"false positives ($fp of $nonDups) must stay under 5% at m=2^20")
  }

  test("expression == independent double-hashing reference on real digests") {
    import graft.functions.BloomFilterOps
    import org.apache.spark.sql.functions._
    val m = 1 << 14 // small m so both outcomes occur
    val k = 5
    val docs = graft.core.Tables(spark, sf, "documents")
    val retained = docs.filter(col("doc_id") % 10 =!= 3).select(md5(col("text")).as("h"))
    val bits = BloomFilterOps.build(retained, m, k)
    // reference bit set from the driver side
    val refBits = new java.util.BitSet(m)
    retained.collect().map(_.getString(0))
      .foreach(h => positions(h, m, k).foreach(refBits.set))
    (0 until m).foreach { p =>
      val got = (bits(p >> 6) & (1L << (p & 63))) != 0L
      assert(got === refBits.get(p), s"bit $p must match the reference build")
    }
    // per-key membership through the registered expression
    val fn = BloomFilterOps.register(spark, bits, m, k)
    val checked = docs.select(md5(col("text")).as("h"))
      .withColumn("maybe", expr(s"$fn(h)"))
      .collect()
    checked.foreach { r =>
      val expected = positions(r.getString(0), m, k).forall(refBits.get)
      assert(r.getBoolean(1) === expected, s"key ${r.getString(0)}")
    }
    // non-vacuous at this geometry: both outcomes occur
    assert(checked.map(_.getBoolean(1)).toSet === Set(true, false))
  }

  test("streaming prefilter == batch q_c61 bloom flags across uneven micro-batches") {
    import graft.functions.BloomFilterOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val docs = graft.core.Tables(sp, sf, "documents")
    val retained = docs.filter(col("doc_id") % 10 =!= 3).select(md5(col("text")).as("h"))
    val bits = BloomFilterOps.build(retained, 1 << 20, 5)
    val fn = BloomFilterOps.register(sp, bits, 1 << 20, 5)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .bloomPrefilter(input.toDF().toDF("doc_id", "text"), fn)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_bloom").toString)
      .format("memory").queryName("bloomflags").outputMode("append").start()
    // deliberately uneven batches: 1, then the bulk, then the tail
    for (chunk <- Seq(incoming.take(1), incoming.slice(1, incoming.length - 7),
        incoming.takeRight(7))) {
      input.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    val streamed = sp.table("bloomflags")
      .select(col("doc_id"), col("bloom_positive"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    val batch = SparkEntry.queries("q_c61_bloom_ingest")(sp, sf)
      .select(col("doc_id"), col("bloom_positive"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("hexWord parses upper/lower hex and rejects garbage loudly") {
    import graft.functions.BloomFilterOps
    assert(BloomFilterOps.hexWord(UTF8String.fromString("0000000000ff"), 0, 12) === 255L)
    assert(BloomFilterOps.hexWord(UTF8String.fromString("0000000000FF"), 0, 12) === 255L)
    assert(BloomFilterOps.hexWord(UTF8String.fromString("ffffffffffff"), 0, 12) ===
      0xFFFFFFFFFFFFL)
    intercept[IllegalArgumentException] {
      BloomFilterOps.hexWord(UTF8String.fromString("00000000000z"), 0, 12)
    }
  }
}
