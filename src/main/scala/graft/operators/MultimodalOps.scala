package graft.operators

import graft.core.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `BINARY` payloads + typed metadata struct, with decode / feature
  * extraction / resize / frame-sampling as batched per-partition
  * operators (north-star addition; no reference counterpart).
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs exist
  * in this container): `StubDecoder` produces a deterministic fake pixel
  * buffer from the payload bytes. Everything AROUND the stub — schema,
  * partitioning, batch shape, the typed Dataset plumbing — is real and
  * tested, so swapping in a real codec is a one-function change.
  *
  * Scale posture: payloads live in the executor partitions only
  * (never collected); decode+featurize is `mapPartitions` so per-batch
  * setup (codec init, model load) amortizes across a whole partition —
  * the JVM analog of `mapInPandas` batch semantics. Feature vectors are
  * small; the heavy binary column is dropped as early as possible.
  */
object MultimodalOps {

  /** Typed media row: binary payload + metadata the planner can prune on. */
  final case class MediaRow(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, // image/video
      sample_rate: Int,        // audio
      n_frames: Int)           // video

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** Deterministic media table derived from `documents` (so the stats
    * query is DuckDB-checkable): payload = UTF-8 text bytes; kind/meta
    * derived from doc fields by fixed arithmetic.
    */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        (lit(8000) + (col("doc_id") % 3) * 8000).cast("int").as("sample_rate"),
        (col("n_chars") % 300 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** STUB decoder — stands in for a real image/audio codec.
    * Deterministic: pixel i = payload[i mod len] scaled to [0,1).
    * ??? in spirit; a real deployment replaces ONLY this object.
    */
  object StubDecoder {
    def decodeToPixels(payload: Array[Byte], n: Int): Array[Float] = {
      val out = new Array[Float](n)
      if (payload.nonEmpty) {
        var i = 0
        while (i < n) { out(i) = (payload(i % payload.length) & 0xff) / 256.0f; i += 1 }
      }
      out
    }
  }

  /** Batched decode + feature extraction. The 8-dim feature vector is a
    * deterministic reduction of the stub pixels (mean per stripe) — the
    * plumbing (one decoder per partition, binary dropped after use) is
    * the real contract.
    */
  def extractFeatures(rows: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition setup happens HERE (codec/model init in real life)
      it.map { m =>
        val n = math.max(dim, math.min(4096, m.payload.length))
        val px = StubDecoder.decodeToPixels(m.payload, n)
        val stripe = n / dim
        val feats = Array.tabulate(dim) { d =>
          var s = 0.0f; var i = d * stripe
          val hi = if (d == dim - 1) n else (d + 1) * stripe
          while (i < hi) { s += px(i); i += 1 }
          s / math.max(1, hi - d * stripe)
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, feats)
      }
    }
  }

  /** Resize metadata op (pure column arithmetic — no decode needed):
    * clamps to a max edge keeping aspect, the usual pre-decode prune.
    */
  def resizePlan(media: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxEdge) / greatest(col("width").cast("double"), col("height").cast("double")))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video rows: every k-th frame index
    * (`spark.range`-style jump index generation, reference P11).
    */
  def frameSamplePlan(media: DataFrame, everyK: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(everyK)).as("frame_indices"))

  /** DuckDB-checkable stats entry over the derived media table. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_c10_multimodal_stats",
      Some("""SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
             |            WHEN doc_id % 3 = 1 THEN 'audio'
             |            ELSE 'video' END AS kind,
             |  COUNT(*) AS n_media,
             |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  CAST(SUM(n_chars % 640 + 1) AS BIGINT) AS total_width
             |FROM documents
             |GROUP BY 1 ORDER BY kind""".stripMargin)
    ) { (s, d) =>
      media(s, d)
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload"))).cast("long").as("total_bytes"),
          sum(col("width")).cast("long").as("total_width"))
        .orderBy(col("kind"))
    },

    // feature extraction is stub-backed ⇒ rows-only check; the spec
    // asserts determinism and batch shape instead
    QueryDef("q_c11_media_features", None) { (s, d) =>
      import s.implicits._
      extractFeatures(media(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          element_at(col("features"), 1).as("f0"))
        .orderBy(col("media_id"))
    }
  )
}
