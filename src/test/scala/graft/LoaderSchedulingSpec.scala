package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q_c62–q_c65 — the loader/scheduling family's semantic properties that
  * the oracles' value-hashes can't express as intent:
  *
  *  - q_c62 temperature sampling upweights SMALL sources (thresholds
  *    anti-monotone in source size) and lands the expected sampled-token
  *    mass near the α-weighted budget share;
  *  - q_c63's bucket report conserves the corpus token count exactly and
  *    every residual lands in the smallest covering bucket;
  *  - q_c64 is leakage-SAFE: every near-dup family is entirely inside
  *    one split, and the leak flag marks exactly the members the naive
  *    rule would have strayed;
  *  - q_c65's schedule is a permutation ordered best-first with an exact
  *    token prefix sum and monotone phases.
  */
class LoaderSchedulingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-loader-sched-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def splitOf(id: Long): Int = {
    val b = ((id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 1000L
    if (b < 800) 0 else if (b < 900) 1 else 2
  }

  test("q_c62: thresholds anti-monotone in source size; sampled mass tracks the α-share") {
    val rows = SparkEntry.queries("q_c62_temperature_mix")(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(1)).map { case (src, rs) =>
      (src, rs.head.getLong(2), rs.head.getLong(3), rs.head.getLong(4))
    }.toSeq
    assert(bySrc.size > 1, "needs multiple sources to be non-vacuous")
    // the threshold is exactly its integer formula
    val tw = bySrc.map(_._3).sum
    val budget = bySrc.map(_._2).sum / 4
    bySrc.foreach { case (src, n, w, thr) =>
      assert(w === math.sqrt(n.toDouble).toLong, s"$src: w = floor(sqrt(n))")
      assert(thr === math.min(1000000L, 1000000L * budget * w / (tw * n)),
        s"$src: threshold must be the exact integer formula")
    }
    // α = 1/2 ⇒ per-token inclusion probability ∝ 1/sqrt(n_s). The
    // FLOOR(SQRT) quantization can reorder near-equal sources by < 1/w
    // relative, so pin anti-monotonicity where quantization cannot flip
    // it: na(1 + 3/w_a) < nb guarantees thr_a >= thr_b.
    for {
      (_, na, wa, ta) <- bySrc
      (_, nb, _, tb) <- bySrc
      if na * (wa + 3) < nb * wa
    } assert(ta >= tb, s"clearly smaller source ($na tok) must sample at >= rate of larger ($nb tok)")
    // thresholds are probabilities in micros
    bySrc.foreach { case (_, _, w, thr) =>
      assert(thr >= 0 && thr <= 1000000)
      assert(w >= 1)
    }
    // expected sampled tokens = Σ_s thr_s/1e6 · n_s ≈ budget = total/4
    // (exact up to the per-source floor, which loses < 1 token-rate each)
    val total = bySrc.map(_._2).sum
    val expected = bySrc.map { case (_, n, _, thr) => thr.toDouble / 1e6 * n }.sum
    assert(math.abs(expected - total / 4.0) <= bySrc.size.toDouble,
      s"expected sampled mass $expected must track budget ${total / 4.0}")
    // the draw is non-vacuous: both outcomes occur
    val sampled = rows.map(_.getLong(5)).toSet
    assert(sampled == Set(0L, 1L))
  }

  test("q_c63: token conservation and minimal covering buckets") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_c63_padding_waste")(spark, sf).collect()
    val buckets = rows.map(_.getLong(0)).toSet
    assert(buckets.subsetOf(Set(16L, 32L, 64L, 128L)))
    // conservation: used tokens across buckets == corpus tokens
    val corpusTokens = graft.core.Tables(spark, sf, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum === corpusTokens)
    rows.foreach { r =>
      val (bucket, nSeqs, used, slots, padded) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(slots === bucket * nSeqs)
      assert(padded === slots - used)
      assert(used <= slots)
      // minimal covering: a bucket's residuals must not all fit the next
      // bucket down, so per-seq mean use exceeds half the bucket… only
      // guaranteed per SEQUENCE, so check the invariant that waste per
      // sequence is < bucket/2 + 128-bucket full chunks exception
      val wastePerSeq = padded.toDouble / nSeqs
      if (bucket > 16) assert(wastePerSeq < bucket / 2.0 + 1e-9,
        s"bucket $bucket: residuals of <= ${bucket / 2} tokens belong one bucket down")
    }
  }

  test("q_c64: families never straddle splits; leak flag exact vs the naive rule") {
    val rows = SparkEntry.queries("q_c64_leakage_split")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val splits = Map("train" -> 0, "val" -> 1, "test" -> 2)
    // family-consistency: every member's split == its family_rep's rule
    rows.foreach { r =>
      val (doc, rep, split, naive, leaked) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))
      assert(splits(split) === splitOf(rep), s"doc $doc must follow family $rep")
      assert(splits(naive) === splitOf(doc))
      assert(leaked === (if (split != naive) 1L else 0L))
      assert(rep <= doc, "representative is the family minimum")
    }
    // grouped view: one split per family
    rows.groupBy(_.getLong(1)).foreach { case (rep, members) =>
      assert(members.map(_.getString(2)).toSet.size === 1,
        s"family $rep must land in exactly one split")
    }
    // non-vacuous on this corpus: the naive rule strays somewhere
    assert(rows.map(_.getLong(4)).sum > 0, "fixture must exercise the leak repair")
    // representatives keep their own (naive == family) assignment
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getLong(4) === 0L))
  }

  test("q_c69: KL >= 0 per source and matches an independent driver-side computation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_c69_source_kl")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent reference from raw text
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
    val tok = "[a-z0-9]+".r
    val bySrc = docs.groupBy(_.getString(0)).map { case (src, ds) =>
      val counts = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(r => tok.findAllIn(r.getString(1).toLowerCase)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1L))
      src -> counts.toMap
    }
    val corpus = scala.collection.mutable.Map.empty[String, Long]
    bySrc.values.foreach(_.foreach { case (t, c) =>
      corpus(t) = corpus.getOrElse(t, 0L) + c
    })
    val nc = corpus.values.sum.toDouble
    rows.foreach { r =>
      val (src, srcTokens, nTerms, kl) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val cs = bySrc(src)
      val ns = cs.values.sum
      assert(srcTokens === ns)
      assert(nTerms === cs.size.toLong)
      assert(kl >= 0.0, s"$src: KL divergence is non-negative")
      val ref = cs.map { case (t, c) =>
        c.toDouble / ns * math.log(c.toDouble * nc / (ns.toDouble * corpus(t)))
      }.sum
      // the engine quantizes each term's contribution at 1e-6
      assert(math.abs(kl - ref) <= nTerms * 1e-6 + 1e-9,
        s"$src: engine KL $kl vs reference $ref")
    }
  }

  test("q_c67: family weight mass is 1 per family; singletons keep weight 1") {
    val rows = SparkEntry.queries("q_c67_softdedup_weights")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val docs = graft.core.Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === docs)
    rows.groupBy(_.getLong(1)).foreach { case (rep, members) =>
      val n = members.head.getLong(2)
      assert(members.length.toLong === n, s"family $rep: fam_size must be the member count")
      members.foreach { r =>
        assert(math.abs(r.getDouble(3) - 1.0 / n) < 1e-6, s"family $rep: weight = 1/n")
      }
      // a family's total sampling mass is one document's worth (up to the
      // 1e-6 decimal quantization per member)
      assert(math.abs(members.map(_.getDouble(3)).sum - 1.0) <= n * 1e-6)
      if (n == 1) assert(members.head.getDouble(3) === 1.0)
    }
    // non-vacuous: downweighting shrinks the effective corpus
    val effective = rows.map(_.getDouble(3)).sum
    assert(effective < docs.toDouble - 1.0, "near-dup families must exist on this corpus")
    // treatment consistency: q_c67's families are exactly q_c64's
    val famSplit = SparkEntry.queries("q_c64_leakage_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CachedRdds.drain()
    rows.foreach(r => assert(r.getLong(1) === famSplit(r.getLong(0)),
      "the two treatments must agree on the family structure"))
  }

  test("q_c65: exact best-first prefix sum with monotone phases") {
    val rows = SparkEntry.queries("q_c65_curriculum")(spark, sf).collect()
    val docs = graft.core.Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === docs, "the schedule is a permutation of the corpus")
    // replay the schedule in its declared order and re-derive the prefix sum
    val ordered = rows.sortBy(r => (-r.getLong(1), r.getLong(0)))
    var cum = 0L
    val total = rows.map(_.getLong(2)).sum
    var lastPhase = 0L
    ordered.foreach { r =>
      assert(r.getLong(3) === cum, s"doc ${r.getLong(0)}: cum_start must be the exact prefix sum")
      val phase = r.getLong(4)
      assert(phase === math.min(3L, cum * 4 / total))
      assert(phase >= lastPhase, "phases never decrease along the schedule")
      lastPhase = phase
      cum += r.getLong(2)
    }
    assert(cum === total)
    // all four phases are populated and quality strictly falls across them
    val byPhase = rows.groupBy(_.getLong(4))
    assert(byPhase.keySet === Set(0L, 1L, 2L, 3L))
    val meanQ = (p: Long) => {
      val rs = byPhase(p); rs.map(_.getLong(1)).sum.toDouble / rs.size
    }
    assert(meanQ(0L) > meanQ(3L), "phase 0 must hold higher-quality docs than phase 3")
  }

  test("q_c81: weighted sample prefers heavy docs, excludes zero-weight docs") {
    val rows = SparkEntry.queries("q_c81_weighted_sample")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    val docs = graft.core.Tables(spark, sf, "documents")
      .selectExpr("doc_id",
        "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val eligible = docs.count(_._2 > 0)
    assert(rows.length === math.min(200, eligible), "sample size = min(k, eligible)")
    assert(rows.forall(_.getLong(1) > 0), "zero-weight docs never sampled")
    // A-ES inclusion bias: the sampled docs' mean weight exceeds the
    // corpus mean (length-proportional sampling must over-represent
    // long documents)
    if (eligible > 400) {
      val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
      val corpusMean = docs.values.filter(_ > 0).sum.toDouble / eligible
      assert(sampleMean > corpusMean,
        s"sample mean $sampleMean must exceed corpus mean $corpusMean")
    }
    // ranks are the pinned total order
    val keys = rows.sortBy(_.getLong(4)).map(r => (-r.getDouble(3), r.getLong(0)))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) }, "rank order pinned")
  }

  test("q_c82: epoch plan conserves the budget and respects the 4-epoch cap") {
    val rows = SparkEntry.queries("q_c82_epoch_plan")(spark, sf).collect()
    graft.core.CachedRdds.drain()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getLong(1)).sum * 4
    val servedTotal = rows.map(_.getAs[Long]("served")).sum
    assert(servedTotal <= budget, "redistribution never exceeds the budget")
    rows.foreach { r =>
      assert(r.getAs[Long]("epochs_milli") <= 4000L, s"${r.getString(0)}: cap")
      assert(r.getAs[Long]("served") <= 4 * r.getLong(1), s"${r.getString(0)}: served cap")
      assert(r.getAs[Long]("served") > 0L, s"${r.getString(0)}: non-vacuous")
    }
    // the redistribution must be non-vacuous on this corpus: some source
    // capped at exactly 4 epochs AND some source served above its raw quota
    assert(rows.exists(_.getAs[Long]("epochs_milli") === 4000L), "a capped source exists")
    assert(rows.exists(r => r.getAs[Long]("served") > r.getAs[Long]("quota")),
      "an uncapped source absorbed redistributed excess")
  }

  test("q_c65 hierarchical prefix sum: exact on a fully CONCENTRATED key") {
    // NEXT r16 lead 3's hazard case: every document lands on ONE qkey, so
    // a flat within-key window would funnel the whole frame through a
    // single partition. The hierarchical form must (a) stay exact and
    // (b) partition its corpus-sized windows by (qkey, blk).
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val n = 20000
    val q = (0 until n).map(i => (i.toLong, (i % 7 + 1).toLong, 42L))
      .toDF("doc_id", "n_tokens", "qkey")
    val out = graft.operators.PipelineQueries.curriculumSchedule(q)
      .orderBy(col("doc_id")).collect()
    assert(out.length === n)
    var cum = 0L
    out.foreach { r => // qkey constant ⇒ schedule order IS doc_id order
      assert(r.getLong(3) === cum, s"doc ${r.getLong(0)}")
      cum += r.getLong(2)
    }
    // plan shape: every corpus-sized window partitions by (qkey, blk) —
    // the only partition-less window is over the ≤1000-row key frame
    // (logical plan: AQE wraps the physical one, hiding WindowExec from
    // collect)
    val windows = graft.operators.PipelineQueries.curriculumSchedule(q)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.count(_.partitionSpec.size == 2) === 1,
      "within-block window must partition by (qkey, blk)")
    assert(windows.count(_.partitionSpec.size == 1) === 1,
      "block-offset window must partition by qkey")
    assert(windows.count(_.partitionSpec.isEmpty) === 1,
      "exactly one global window (the ≤1000-row key-offset frame)")
  }

  test("q_c122: both plans partition the corpus; snake dealing beats the hash on balance") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q_c122_export_shard_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val docs = graft.core.Tables(spark, sf, "documents")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(_.getLong(0))
    val ttot = docs.sum
    // each strategy is a PARTITION of the corpus: 8 shards, all docs,
    // all tokens accounted for
    for (strat <- Seq("hash", "sized")) {
      val g = rows.filter(_._1 == strat)
      assert(g.map(_._2).sorted === (0L to 7L), s"$strat shard ids")
      assert(g.map(_._3).sum == docs.length.toLong, s"$strat doc total")
      assert(g.map(_._4).sum == ttot, s"$strat token total")
    }
    // basis-point arithmetic ties to the emitted masses
    for ((strat, _, _, tok, bp, dev) <- rows) {
      assert(bp == tok * 10000 / ttot, s"$strat tok_bp")
      assert(dev == tok * 80000 / ttot - 10000, s"$strat dev_bp")
    }
    // the point of the query: the size-aware plan must measurably beat
    // the size-blind hash on worst-shard deviation (here it is ~25x)
    val worst = (strat: String) =>
      rows.filter(_._1 == strat).map(r => math.abs(r._6)).max
    assert(worst("sized") < worst("hash"),
      s"sized ${worst("sized")} bp must beat hash ${worst("hash")} bp")
    // snake dealing hands every shard an equal DOC count (+-1 per block;
    // this fixture is a single 4096-doc block)
    val sizedDocs = rows.filter(_._1 == "sized").map(_._3)
    assert(sizedDocs.max - sizedDocs.min <= 1L)
  }

  test("q_c124: manifest describes exactly the q_c122 sized export; digests are additive and tamper-evident") {
    import org.apache.spark.sql.functions.{col, expr, md5}
    val M = 1152921504606846976L // 2^60
    val manifest = SparkEntry.queries("q_c124_export_manifest")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // single-copy rule: the manifest's per-shard masses are the plan's
    // `sized` rows, shard for shard
    val plan = SparkEntry.queries("q_c122_export_shard_plan")(spark, sf)
      .collect().filter(_.getString(0) == "sized")
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(manifest.map(r => (r._1, r._2, r._3)).sorted === plan.sorted,
      "manifest masses must equal the q_c122 sized assignment")
    // driver-side recomputation from raw (shard, md5) rows: digest =
    // sum of 60-bit md5 chunks mod 2^60, order-independent
    val raw = graft.operators.PipelineQueries.snakeDeal(
        graft.core.Tables(spark, sf, "documents")
          .select(col("doc_id"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"),
            md5(col("text")).as("h")))
      .select(col("shard"), col("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def chunks(h: String) = Spec128.chunks(h)
    val expect = raw.groupBy(_._1).map { case (sh, g) =>
      val cs = g.map(x => chunks(x._2))
      (sh, cs.map(_._1).sum.mod(BigInt(M)).toLong,
        cs.map(_._2).sum.mod(BigInt(M)).toLong)
    }
    assert(manifest.map(r => (r._1, r._4, r._5)).toSet ===
      expect.map(e => (e._1, e._2, e._3)).toSet,
      "digests must equal the independent driver-side additive fold")
    // tamper evidence: substituting any one doc's content moves its
    // shard's digest (chunk delta != 0 mod 2^60 for a changed md5 half)
    val (sh0, h0) = raw.head
    val forged = chunks(md5Hex(h0 + "!"))
    val orig = chunks(h0)
    val row0 = manifest.find(_._1 == sh0).get
    val forgedA = (BigInt(row0._4) - orig._1 + forged._1)
      .mod(BigInt(M)).toLong
    assert(forgedA != row0._4, "a substituted doc must move the digest")
    // additivity (the mergeable-aggregate property): splitting a shard's
    // rows arbitrarily and summing partial digests lands on the total
    val g0 = raw.filter(_._1 == sh0).map(x => chunks(x._2)._1)
    val (l, rpart) = g0.splitAt(g0.length / 2)
    assert((l.sum.mod(BigInt(M)) + rpart.sum.mod(BigInt(M))).mod(BigInt(M)).toLong == row0._4)
  }

  test("q_c125: diff touches exactly the shards the batch hashes to; manifests update additively") {
    import org.apache.spark.sql.functions.col
    val M = BigInt(1152921504606846976L) // 2^60
    // purpose-built corpus: 60 docs, batch = doc_id % 10 == 3 (6 docs) —
    // the LCG sends them to shards {0,2,3,4,5,7} only, so the stability
    // claim (untouched shard ⇒ unchanged manifest) is exercised on 1/6
    val tmp = java.nio.file.Files.createTempDirectory("graft-manifest-diff")
    val rows = (0L until 60L).map(i => (i, s"doc $i " + ("w " * (i % 7 + 1).toInt).trim))
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    val out = SparkEntry.queries("q_c125_manifest_diff")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    def lcg(id: Long) = ((id % 1000000007L) * 1103515245L + 12345L) % 1000000007L % 8L
    val batchShards = rows.map(_._1).filter(_ % 10 == 3).map(lcg).toSet
    assert(batchShards.size < 8, "fixture must leave at least one shard untouched")
    for ((sh, na, nb, added, _, _, changed) <- out) {
      if (batchShards.contains(sh)) {
        assert(added > 0 && changed == 1L, s"shard $sh must register the batch")
      } else {
        assert(added == 0L && na == nb && changed == 0L,
          s"untouched shard $sh must keep an unchanged manifest")
      }
      // n_added is exactly the batch arrivals hashing there
      assert(added == rows.map(_._1).count(i => i % 10 == 3 && lcg(i) == sh).toLong)
    }
    // additive update: digest_B == digest_A + digest(batch) mod 2^60,
    // per shard per chunk — recomputed driver-side from raw md5s
    def digests(ids: Long => Boolean) = rows.filter(r => ids(r._1))
      .groupBy(r => lcg(r._1)).map { case (sh, g) =>
        val cs = g.map(r => chunks(md5Hex(r._2)))
        (sh, (cs.map(_._1).sum.mod(M), cs.map(_._2).sum.mod(M)))
      }
    val va = digests(_ % 10 != 3)
    val vb = digests(_ => true)
    val batch = digests(_ % 10 == 3)
    for ((sh, b) <- vb) {
      val a = va.getOrElse(sh, (BigInt(0), BigInt(0)))
      val add = batch.getOrElse(sh, (BigInt(0), BigInt(0)))
      assert(((a._1 + add._1).mod(M), (a._2 + add._2).mod(M)) === b,
        s"shard $sh: manifest must be updatable from the batch alone")
    }
    graft.core.CachedRdds.drain()
  }

  test("streaming manifest: per-batch served state == batch manifest of each prefix union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, expr, md5}
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val rows = graft.core.Tables(sp, sf, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    def batchManifest(docs: Seq[(Long, String)]) =
      graft.operators.PipelineQueries.manifestDigest(
        sp.createDataFrame(docs).toDF("doc_id", "text")
          .select(graft.operators.PipelineQueries.lcgShard.as("shard"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"),
            md5(col("text")).as("h")))
        .collect().map(_.toString).toSet
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps
      .manifestUpdates(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_manifest").toString)
      .format("memory").queryName("manifeststate").outputMode("complete").start()
    // uneven micro-batches; after EACH one the served state must equal
    // the batch manifest of the prefix union — the additive-update
    // identity live (re-manifesting per arrival, no base re-read)
    val cuts = Seq(7, 180, rows.length)
    var prev = 0
    for (cut <- cuts) {
      input.addData(rows.slice(prev, cut).toSeq)
      q.processAllAvailable()
      val served = sp.table("manifeststate").collect().map(_.toString).toSet
      assert(served === batchManifest(rows.take(cut).toSeq),
        s"prefix $cut: streamed manifest must equal the batch manifest")
      prev = cut
    }
    q.stop()
    graft.core.CachedRdds.drain()
  }

  // 64-bit md5 halves (hex 1-16 / 17-32): ALL 128 bits enter the digest
  private def chunks(h: String): (BigInt, BigInt) = Spec128.chunks(h)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

/** 64-bit md5 halves (hex digits 1-16 / 17-32) as BigInts — the
  * spec-side twin of PipelineQueries.manifestDigest's chunk rule.
  */
object Spec128 {
  def chunks(h: String): (BigInt, BigInt) =
    (BigInt(h.substring(0, 16), 16), BigInt(h.substring(16, 32), 16))
}
