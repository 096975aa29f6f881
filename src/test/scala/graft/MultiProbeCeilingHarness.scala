package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityQueries

/** Manual measurement harness (NOT a spec) closing the q_c9 uniform
  * frontier question (VERDICT r13 lead 4, carried since r10): instead of
  * implementing yet another cell-selection scheme and measuring it, this
  * measures the CEILING of the whole scheme family — given the trained
  * quantizer, what is the best recall ANY multi-probe cell-ordering
  * policy could reach at a fixed scanned-rows budget?
  *
  * Three frontiers over the standard 200-query methodology
  * (vec_id % 100 == 0, recall@5 vs exact brute force):
  *
  *   1. status quo: fixed global nprobe, centroid-distance order — the
  *      shipped search at several operating points;
  *   2. prefix oracle: per-query ADAPTIVE prefix lengths of the
  *      centroid-distance ordering, allocated across queries by a
  *      Lagrangian sweep — the upper envelope of every "probe nearer
  *      cells first, spend the budget where it pays" policy (multi-probe
  *      orderings, distance-ratio cutoffs, adaptive nprobe all live
  *      UNDER this curve);
  *   3. free-choice oracle: perfect knowledge of which cells hold the
  *      true neighbors (cells ranked by neighbors-per-row, any order) —
  *      the information-theoretic ceiling of ANY cell predictor
  *      (residual quantizers, learned routing) with this coarse
  *      quantizer.
  *
  *   sbt "Test/runMain graft.MultiProbeCeilingHarness /root/testdata/sf0.1"
  */
object MultiProbeCeilingHarness {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.CosineSimilarity.register(spark)
    val e = SimilarityQueries.ivfCorpus(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    val (fn, _) = SimilarityQueries.trainIvf(spark, e)
    val k = math.min(16384, math.max(8, 4 * math.sqrt(n.toDouble).toInt))

    // cell of every corpus vector + cell sizes
    val cellOf: Map[Long, Int] = e
      .withColumn("cell", expr(s"element_at($fn(v, 1), 1)"))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellSize: Map[Int, Long] =
      cellOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // per-query full centroid-distance cell ordering (k cells)
    val ordering: Map[Long, Array[Int]] = e
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), expr(s"$fn(v, $k)").as("ord"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap

    // exact brute-force top-5 (the ivfQuality ground truth, same SQL)
    val cosExpr = "CAST(cosine_similarity(v, qv) AS DECIMAL(18,6))"
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val brute: Map[Long, Set[Long]] = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(expr(cosExpr), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val queries = ordering.keys.toSeq.sorted
    val nq = queries.size
    println(s"[ceiling] corpus n=$n k=$k queries=$nq")

    // per-query (gain, rows) prefix curves for the two oracle families
    def prefixCurves(cells: Long => Seq[Int]): Map[Long, (Array[Double], Array[Long])] =
      queries.map { qid =>
        val nbrCellCount: Map[Int, Int] = brute(qid).toSeq
          .groupBy(v => cellOf(v)).view.mapValues(_.size).toMap
        val cs = cells(qid)
        val gains = new Array[Double](cs.length + 1)
        val rows = new Array[Long](cs.length + 1)
        var g = 0.0; var r = 0L; var i = 0
        while (i < cs.length) {
          g += nbrCellCount.getOrElse(cs(i), 0).toDouble / brute(qid).size
          r += cellSize.getOrElse(cs(i), 0L)
          gains(i + 1) = g; rows(i + 1) = r; i += 1
        }
        qid -> (gains, rows)
      }.toMap

    // family 2: centroid-distance order (any adaptive-prefix policy)
    val prefixOracle = prefixCurves(qid => ordering(qid).toSeq)
    // family 3: perfect cell knowledge — neighbor cells only, best
    // neighbors-per-row first (optimal for any cell predictor)
    val freeOracle = prefixCurves { qid =>
      brute(qid).toSeq.groupBy(v => cellOf(v)).view.mapValues(_.size).toSeq
        .sortBy { case (c, cnt) => (-cnt.toDouble / cellSize(c), c) }
        .map(_._1)
    }

    // Lagrangian sweep: per λ each query independently maximizes
    // gain(p) − λ·rows(p); the resulting (rows, recall) points trace the
    // optimal frontier of the separable allocation problem
    def frontier(curves: Map[Long, (Array[Double], Array[Long])]): Seq[(Double, Double)] = {
      val lambdas = (-60 to 0).map(i => math.pow(10, i / 10.0) / (n.toDouble))
      lambdas.map { lam =>
        var rows = 0L; var gain = 0.0
        queries.foreach { qid =>
          val (gs, rs) = curves(qid)
          var best = 0; var bestV = 0.0; var p = 0
          while (p < gs.length) {
            val v = gs(p) - lam * rs(p)
            if (v > bestV + 1e-12) { bestV = v; best = p }
            p += 1
          }
          rows += rs(best); gain += gs(best)
        }
        (rows.toDouble / (nq.toDouble * n), gain / nq)
      }
    }

    // dense ACHIEVABLE frontier: per query, take the upper-concave
    // envelope of its (rows, gain) prefix curve (vertices = the prefix
    // depths worth stopping at), then merge every envelope segment
    // across queries by slope descending — the optimal allocation for
    // separable concave curves, realizable at every intermediate point
    // (each point = an integer prefix per query)
    def greedyFrontier(curves: Map[Long, (Array[Double], Array[Long])]): Seq[(Double, Double)] = {
      val segments = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Double)]
      queries.foreach { qid =>
        val (gs, rs) = curves(qid)
        // concave envelope via monotone-slope stack of (p, rows, gain)
        val hull = scala.collection.mutable.ArrayBuffer((0L, 0.0))
        var p = 1
        while (p < gs.length) {
          if (gs(p) > hull.last._2 + 1e-12) {
            var keep = true
            while (keep && hull.length >= 2) {
              val (r1, g1) = hull(hull.length - 1)
              val (r0, g0) = hull(hull.length - 2)
              val sPrev = (g1 - g0) / math.max(1L, r1 - r0).toDouble
              val sNew = (gs(p) - g1) / math.max(1L, rs(p) - r1).toDouble
              if (sNew >= sPrev - 1e-15) hull.remove(hull.length - 1) else keep = false
            }
            hull += ((rs(p), gs(p)))
          }
          p += 1
        }
        var i = 1
        while (i < hull.length) {
          val dr = hull(i)._1 - hull(i - 1)._1
          val dg = hull(i)._2 - hull(i - 1)._2
          segments += ((dg / math.max(1L, dr).toDouble, dr, dg))
          i += 1
        }
      }
      var rows = 0L; var gain = 0.0
      val out = scala.collection.mutable.ArrayBuffer((0.0, 0.0))
      segments.sortBy(-_._1).foreach { case (_, dr, dg) =>
        rows += dr; gain += dg
        out += ((rows.toDouble / (nq.toDouble * n), gain / nq))
      }
      out.toSeq
    }

    // PRACTICAL observable policy: equal ROW budget per query — each
    // query extends its centroid-distance prefix while its own scanned
    // rows stay under (global budget / nq). Uses only observable
    // quantities (cell order + cell sizes), no oracle knowledge.
    def equalRows(budgetFrac: Double): (Double, Double) = {
      val share = budgetFrac * n
      var rows = 0L; var gain = 0.0
      queries.foreach { qid =>
        val (gs, rs) = prefixOracle(qid)
        var p = 0
        while (p < gs.length - 1 && rs(p + 1) <= share) p += 1
        rows += rs(p); gain += gs(p)
      }
      (rows.toDouble / (nq.toDouble * n), gain / nq)
    }

    def report(tag: String, fr: Seq[(Double, Double)]): Unit = {
      // best recall achievable within each scanned-rows budget
      for (budget <- Seq(0.08, 0.125, 0.25, 0.50)) {
        val best = fr.filter(_._1 <= budget + 1e-9).map(_._2).foldLeft(0.0)(math.max)
        println(f"[ceiling] $tag: budget ${budget * 100}%5.1f%% rows -> recall@5 $best%.3f")
      }
      // min rows for high recall
      for (target <- Seq(0.90, 0.95, 1.0)) {
        val need = fr.filter(_._2 >= target - 1e-9).map(_._1)
        val m = if (need.isEmpty) Double.NaN else need.min
        println(f"[ceiling] $tag: recall ≥ $target%.2f needs ${m * 100}%5.1f%% rows")
      }
    }

    // family 1: status-quo fixed nprobe (prefix length equal across queries)
    val fixed = Seq(math.sqrt(k.toDouble).toInt, k / 8, k / 4, k / 2, k).distinct.map { p =>
      val rows = queries.map(qid => prefixOracle(qid)._2(p)).sum
      val gain = queries.map(qid => prefixOracle(qid)._1(p)).sum
      (p, rows.toDouble / (nq.toDouble * n), gain / nq)
    }
    fixed.foreach { case (p, fr, g) =>
      println(f"[ceiling] fixed nprobe=$p%4d: ${fr * 100}%5.1f%% rows -> recall@5 $g%.3f")
    }
    report("prefix-oracle hull", frontier(prefixOracle))
    report("prefix-oracle greedy (achievable)", greedyFrontier(prefixOracle))
    report("free-oracle hull", frontier(freeOracle))
    for (b <- Seq(0.08, 0.125, 0.25, 0.50)) {
      val (fr, g) = equalRows(b)
      println(f"[ceiling] equal-rows policy @ per-query share ${b * 100}%5.1f%%: " +
        f"${fr * 100}%5.1f%% rows -> recall@5 $g%.3f")
    }
    spark.stop()
  }
}
