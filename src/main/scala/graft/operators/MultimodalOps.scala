package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.core.{QueryDef, Tables}
import graft.core.Decimals.emitQ
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `BINARY` payloads + typed metadata struct, with decode / feature
  * extraction / resize / frame-sampling as batched per-partition
  * operators (north-star addition; no reference counterpart — the
  * reference's analogous move is decoding a real binary format end-to-end,
  * `io_utils.py:122-151`).
  *
  * The decode step is REAL: payloads are genuine PNG images (encoded and
  * decoded with `javax.imageio`), genuine RIFF/WAVE PCM16 audio
  * (`javax.sound.sampled`), and a framed container of PNG frames for
  * video. Because the pixel/sample GENERATORS are fixed integer
  * arithmetic and both codecs are lossless, the decoded checksums have a
  * closed form that the DuckDB oracle reproduces with `range()` joins —
  * so the whole encode→decode→featurize path is hash-checked end to end.
  *
  * Scale posture: payloads live in the executor partitions only
  * (never collected); encode and decode+featurize are `mapPartitions` so
  * per-batch setup (codec init, model load) amortizes across a whole
  * partition — the JVM analog of `mapInPandas` batch semantics. Feature
  * vectors are small; the heavy binary column is dropped as early as
  * possible.
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

  /** Decoded media: unit count (pixels / samples / frames), integer
    * checksum over the decoded values, and a fixed-dim feature vector
    * (stripe means of the normalized decoded sequence).
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_units: Long,
      value_sum: Long,
      features: Array[Float])

  /** Deterministic metadata-only media table derived from `documents` (so
    * the stats query is DuckDB-checkable): payload = UTF-8 text bytes;
    * kind/meta derived from doc fields by fixed arithmetic. Used by the
    * metadata-plane ops (stats, resize, frame sampling) that never decode.
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

  /** Real JDK media codec. Encoders synthesize genuine format bytes from
    * the deterministic generators below; decoders parse ONLY the bytes
    * (no generator knowledge), so a decode bug cannot cancel out an
    * encode bug — and both PNG (8-bit gray) and WAV (PCM16) are lossless,
    * so decoded values equal generated values exactly.
    *
    * Generators (all integer arithmetic, mirrored in the q_c11 oracle):
    *   image  w = id%56+8, h = id%40+8,   v(x,y)    = (id·31 + x·7 + y·13) mod 256
    *   audio  n = id%800+100,             s(i)      = (id·7919 + i·104729) mod 65536 − 32768
    *   video  f = id%4+2, frames 16×12,   v(x,y,fr) = (id·31 + fr·17 + x·7 + y·13) mod 256
    */
  object MediaCodec {
    // no tmp-file cache for ImageIO streams (gVisor disk writes are slow)
    javax.imageio.ImageIO.setUseCache(false)

    val VideoFrameW = 16
    val VideoFrameH = 12

    def imageDims(id: Long): (Int, Int) = ((id % 56 + 8).toInt, (id % 40 + 8).toInt)
    def imagePixel(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
    def audioLen(id: Long): Int = (id % 800 + 100).toInt
    def audioSample(id: Long, i: Int): Int =
      ((id * 7919 + i.toLong * 104729) % 65536 - 32768).toInt
    def videoFrames(id: Long): Int = (id % 4 + 2).toInt
    def videoPixel(id: Long, fr: Int, x: Int, y: Int): Int =
      ((id * 31 + fr * 17 + x * 7 + y * 13) % 256).toInt

    /** q_c41 near-dup image family: ids in the same `id div 8` block share
      * one BASE image (identical dims and base pixels) perturbed by a
      * per-id sparse +1 noise (~0.7 % of pixels) — byte-level different,
      * perceptually identical. Every third block is replaced by per-id
      * UNIQUE images (salted base, disjoint from any block base), so the
      * fixture has both true near-dup families and singletons.
      */
    def ndBase(id: Long): Long =
      if ((id / 8) % 3 == 0) id * 1000003L + 500000009L else id / 8
    def ndDims(id: Long): (Int, Int) = {
      val b = ndBase(id)
      ((b % 56 + 8).toInt, (b % 40 + 8).toInt)
    }
    def ndPixel(id: Long, x: Int, y: Int): Int = {
      val noise = if ((x * 31L + y * 17L + id * 13L) % 149L == 0L) 1 else 0
      ((ndBase(id) * 31 + x * 7 + y * 13 + noise) % 256).toInt
    }

    // One-shot convenience wrappers (specs, single calls). The hot
    // mapPartitions paths instantiate ONE MediaCoder per partition instead:
    // ImageIO.read/write and AudioSystem.getAudioInputStream/write each do a
    // synchronized global service-registry lookup PER CALL, which serializes
    // 32 decode threads (measured: q_c11 5.7→37 s regressions at local[32]).
    def encodeImage(id: Long): Array[Byte] = new MediaCoder().encodeImage(id)
    def encodeAudio(id: Long, sampleRate: Int): Array[Byte] =
      new MediaCoder().encodeAudio(id, sampleRate)
    def encodeVideo(id: Long): Array[Byte] = new MediaCoder().encodeVideo(id)
    def decodeImage(payload: Array[Byte]): (Long, Long, Array[Float]) =
      new MediaCoder().decodeImage(payload)
    def resizeImageSum(payload: Array[Byte], outW: Int, outH: Int): Long =
      new MediaCoder().resizeImageSum(payload, outW, outH)
    def decodeAudio(payload: Array[Byte]): (Long, Long, Array[Float]) =
      new MediaCoder().decodeAudio(payload)
    def decodeVideo(payload: Array[Byte], everyK: Int = 2): (Long, Long, Array[Float]) =
      new MediaCoder().decodeVideo(payload, everyK)
  }

  /** Per-partition codec instance: resolves the PNG reader/writer and the
    * WAV `AudioFileReader`/`AudioFileWriter` service providers ONCE at
    * construction and reuses them for every row. The static `ImageIO` /
    * `AudioSystem` entry points take a global registry lock on each call —
    * the reference's analog is one reader handle per worker
    * (`io_utils.py:45-47`); this is the JVM equivalent.
    *
    * NOT thread-safe (the readers/writers hold per-decode state); one
    * instance per partition iterator, which Spark runs single-threaded.
    */
  final class MediaCoder {
    import MediaCodec._

    private val pngWriter: javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "no PNG writer in JDK")
      it.next()
    }
    private val pngReader: javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      require(it.hasNext, "no PNG reader in JDK")
      it.next()
    }
    // java.desktop publishes its WAVE codec through the standard SPI; load
    // the provider list once instead of per-call inside AudioSystem.
    private val audioReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
      val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .forEach(r => b += r)
      b.result()
    }
    private val audioWriters: Array[javax.sound.sampled.spi.AudioFileWriter] = {
      val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .forEach(w => b += w)
      b.result()
    }

    private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        pngWriter.setOutput(ios)
        pngWriter.write(img)
        ios.flush()
      } finally {
        pngWriter.setOutput(null)
        ios.close()
      }
      bos.toByteArray
    }

    private def readPng(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        pngReader.setInput(iis, true, true)
        // unlike ImageIO.read (null on unrecognized input), a dedicated
        // reader throws — normalize to one diagnostic message
        try pngReader.read(0)
        catch {
          case e: javax.imageio.IIOException =>
            throw new IllegalArgumentException("payload is not a decodable image", e)
        }
      } finally {
        pngReader.setInput(null)
        iis.close()
      }
    }

    private def grayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { r.setSample(x, y, 0, v(x, y)); x += 1 }
        y += 1
      }
      writePng(img)
    }

    def encodeImage(id: Long): Array[Byte] = {
      val (w, h) = imageDims(id)
      grayPng(w, h, (x, y) => imagePixel(id, x, y))
    }

    def encodeNdImage(id: Long): Array[Byte] = {
      val (w, h) = ndDims(id)
      grayPng(w, h, (x, y) => ndPixel(id, x, y))
    }

    /** Perceptual average-hash of a decoded image: nearest-neighbor
      * sample an 8×8 grid (source pixel of (x, y) is (x·w div 8,
      * y·h div 8) — q_c18's resample rule), threshold each sample
      * against the strict grid mean (v·64 > Σ), pack row-major into a
      * 64-char bitstring. Pure integer arithmetic over DECODED pixels,
      * so the oracle reproduces it in closed form from the generator.
      */
    def imageAHash(payload: Array[Byte]): String = {
      val img = readPng(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val r = img.getRaster
      val v = new Array[Int](64)
      var sum = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val s = r.getSample(x * w / 8, y * h / 8, 0)
          v(y * 8 + x) = s
          sum += s
          x += 1
        }
        y += 1
      }
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < 64) { sb.append(if (v(i) * 64L > sum) '1' else '0'); i += 1 }
      sb.toString
    }

    def encodeAudio(id: Long, sampleRate: Int): Array[Byte] = {
      val n = audioLen(id)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) { // little-endian signed 16-bit mono
        val s = audioSample(id, i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new ByteArrayOutputStream()
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val w = audioWriters.find(_.isFileTypeSupported(wave, ais))
        .getOrElse(sys.error("no WAVE writer in JDK"))
      w.write(ais, wave, bos)
      bos.toByteArray
    }

    /** Framed video container: int32-BE frame count, then per frame an
      * int32-BE length + a PNG frame. (No JDK video codec exists; the
      * container is ours, the frames are real PNG.)
      */
    def encodeVideo(id: Long): Array[Byte] = {
      val f = videoFrames(id)
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(f)
      var fr = 0
      while (fr < f) {
        val png = grayPng(VideoFrameW, VideoFrameH, (x, y) => videoPixel(id, fr, x, y))
        out.writeInt(png.length)
        out.write(png)
        fr += 1
      }
      out.flush()
      bos.toByteArray
    }

    /** Decode a PNG payload → (nPixels, Σ gray values, normalized pixels). */
    def decodeImage(payload: Array[Byte]): (Long, Long, Array[Float]) = {
      val img = readPng(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val r = img.getRaster
      val px = new Array[Float](w * h)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = r.getSample(x, y, 0)
          sum += v
          px(y * w + x) = v / 256.0f
          x += 1
        }
        y += 1
      }
      (w.toLong * h, sum, px)
    }

    /** Decode a PNG payload and nearest-neighbor resample to (outW, outH):
      * returns the checksum over the RESIZED raster. Pixel (x', y') of
      * the output samples source (x'·w DIV outW, y'·h DIV outH) — the
      * standard NN resize, integer arithmetic so the oracle reproduces
      * it in closed form.
      */
    def resizeImageSum(payload: Array[Byte], outW: Int, outH: Int): Long = {
      val img = readPng(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val r = img.getRaster
      var sum = 0L
      var y = 0
      while (y < outH) {
        val sy = y * h / outH
        var x = 0
        while (x < outW) { sum += r.getSample(x * w / outW, sy, 0); x += 1 }
        y += 1
      }
      sum
    }

    /** Decode a WAV payload → (nSamples, Σ signed samples, normalized). */
    def decodeAudio(payload: Array[Byte]): (Long, Long, Array[Float]) = {
      // fresh stream per provider attempt (cheap — wraps the same array):
      // reset() only returns to the last mark(), so a provider that marks at
      // a non-zero offset before rejecting would corrupt later attempts.
      // IOException is likewise a skip-to-next-reader signal, not fatal.
      val ais = audioReaders.iterator
        .flatMap { r =>
          try Some(r.getAudioInputStream(new ByteArrayInputStream(payload)))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        }
        .nextOption()
        .getOrElse(sys.error("payload is not a decodable audio stream"))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected PCM16 mono, got $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val px = new Array[Float](n)
      var sum = 0L
      var i = 0
      while (i < n) { // little-endian signed 16-bit
        val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
        sum += s
        px(i) = (s + 32768) / 65536.0f
        i += 1
      }
      (n.toLong, sum, px)
    }

    /** Decode the framed video container, sampling every `everyK`-th
      * frame → (total frames, Σ gray values over sampled frames,
      * normalized sampled pixels).
      */
    def decodeVideo(payload: Array[Byte], everyK: Int = 2): (Long, Long, Array[Float]) = {
      val in = new DataInputStream(new ByteArrayInputStream(payload))
      val f = in.readInt()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Float]
      var sum = 0L
      var fr = 0
      while (fr < f) {
        val len = in.readInt()
        val png = new Array[Byte](len)
        in.readFully(png)
        if (fr % everyK == 0) {
          val (_, s, px) = decodeImage(png)
          sum += s
          buf ++= px
        }
        fr += 1
      }
      (f.toLong, sum, buf.toArray)
    }
  }

  /** Media table with REAL encoded payloads (PNG / WAV / framed PNG
    * video), deterministic per `media_id`. Encoding runs `mapPartitions`
    * on the executors — at 100 TB this is the ingest-side "render and
    * store" stage, and nothing ever passes through the driver.
    */
  def encodedMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        (lit(8000) + (col("doc_id") % 3) * 8000).cast("int").as("sample_rate"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val coder = new MediaCoder() // one provider lookup per partition
        it.map { case (id, rate) =>
          (id % 3) match {
            case 0 =>
              val (w, h) = MediaCodec.imageDims(id)
              MediaRow(id, "image", coder.encodeImage(id), w, h, 0, 0)
            case 1 =>
              MediaRow(id, "audio", coder.encodeAudio(id, rate), 0, 0, rate, 0)
            case _ =>
              MediaRow(id, "video", coder.encodeVideo(id),
                MediaCodec.VideoFrameW, MediaCodec.VideoFrameH, 0,
                MediaCodec.videoFrames(id))
          }
        }
      }
  }

  /** Batched decode + feature extraction over real payloads: one decoder
    * per partition, binary dropped after use. The 8-dim feature vector is
    * the per-stripe mean of the normalized decoded sequence.
    */
  def decodeFeatures(rows: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition setup: provider resolution happens once, not per row
      val coder = new MediaCoder()
      it.map { m =>
        val (nUnits, sum, px) = m.kind match {
          case "image" => coder.decodeImage(m.payload)
          case "audio" => coder.decodeAudio(m.payload)
          case _       => coder.decodeVideo(m.payload)
        }
        val n = px.length
        val stripe = math.max(1, n / dim)
        val feats = Array.tabulate(dim) { d =>
          var s = 0.0f
          var i = d * stripe
          val hi = if (d == dim - 1) n else math.min(n, (d + 1) * stripe)
          while (i < hi) { s += px(i); i += 1 }
          if (hi > d * stripe) s / (hi - d * stripe) else 0.0f
        }
        MediaFeatures(m.media_id, m.kind, nUnits, sum, feats)
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

  val defs: Seq[QueryDef] = Seq(
    // ---- metadata-plane stats over the derived media table ---------------
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

    // ---- real encode → decode → featurize, hash-checked ------------------
    // The oracle replicates the deterministic generators in closed form
    // (range() joins); Spark's numbers come ONLY from javax.imageio /
    // javax.sound.sampled decode of the real PNG/WAV bytes, so a match
    // proves the whole codec round-trip, not the arithmetic.
    QueryDef(
      "q_c11_media_features",
      Some("""WITH img_d AS (
             |  SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |img_x AS (SELECT doc_id, h, unnest(range(w)) AS x FROM img_d),
             |img_xy AS (SELECT doc_id, x, unnest(range(h)) AS y FROM img_x),
             |img AS (
             |  SELECT doc_id AS media_id, 'image' AS kind,
             |         COUNT(*) AS n_units,
             |         CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
             |  FROM img_xy GROUP BY doc_id),
             |aud_d AS (
             |  SELECT doc_id, doc_id % 800 + 100 AS n
             |  FROM documents WHERE doc_id % 3 = 1),
             |aud_i AS (SELECT doc_id, unnest(range(n)) AS i FROM aud_d),
             |aud AS (
             |  SELECT doc_id AS media_id, 'audio' AS kind,
             |         COUNT(*) AS n_units,
             |         CAST(SUM((doc_id * 7919 + i * 104729) % 65536 - 32768) AS BIGINT) AS value_sum
             |  FROM aud_i GROUP BY doc_id),
             |vid_d AS (
             |  SELECT doc_id, doc_id % 4 + 2 AS f
             |  FROM documents WHERE doc_id % 3 = 2),
             |vid_f AS (SELECT doc_id, f, unnest(range(f)) AS fr FROM vid_d),
             |vid_fx AS (SELECT doc_id, f, fr, unnest(range(16)) AS x
             |           FROM vid_f WHERE fr % 2 = 0),
             |vid_fxy AS (SELECT doc_id, f, fr, x, unnest(range(12)) AS y FROM vid_fx),
             |vid AS (
             |  SELECT doc_id AS media_id, 'video' AS kind,
             |         CAST(MAX(f) AS BIGINT) AS n_units,
             |         CAST(SUM((doc_id * 31 + fr * 17 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
             |  FROM vid_fxy GROUP BY doc_id)
             |SELECT media_id, kind, n_units, value_sum FROM
             |  (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid)
             |ORDER BY media_id""".stripMargin)
    ) { (s, d) =>
      decodeFeatures(encodedMedia(s, d))
        .toDF()
        .select(col("media_id"), col("kind"),
          col("n_units").cast("long").as("n_units"),
          col("value_sum").cast("long").as("value_sum"))
        .orderBy(col("media_id"))
    },

    // ---- decoded-pixel nearest-neighbor resize, hash-checked --------------
    // Real decode (javax.imageio) + NN resample to 16x12. Source pixel of
    // output (x', y') is (x'·w DIV 16, y'·h DIV 12) — integer arithmetic,
    // so the oracle reproduces the RESIZED checksum in closed form from
    // the pixel generator. Complements the metadata-plane resizePlan
    // (which never decodes): this is the decode-side half of the resize
    // pipeline stage, one mapPartitions pass, no shuffle before the
    // final ORDER BY.
    QueryDef(
      "q_c18_media_resize",
      Some("""WITH img_d AS (
             |  SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
             |  FROM documents WHERE doc_id % 3 = 0),
             |ox AS (SELECT doc_id, w, h, unnest(range(16)) AS x FROM img_d),
             |oxy AS (SELECT doc_id, w, h, x, unnest(range(12)) AS y FROM ox),
             |px AS (
             |  SELECT doc_id,
             |         (doc_id * 31 + (x * w // 16) * 7 + (y * h // 12) * 13) % 256 AS v
             |  FROM oxy)
             |SELECT doc_id AS media_id, CAST(16 AS BIGINT) AS out_w,
             |       CAST(12 AS BIGINT) AS out_h,
             |       CAST(SUM(v) AS BIGINT) AS resized_sum
             |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin)
    ) { (s, d) =>
      import s.implicits._
      encodedMedia(s, d)
        .filter(_.kind == "image")
        .mapPartitions { it =>
          val coder = new MediaCoder()
          it.map(m => (m.media_id, 16L, 12L,
            coder.resizeImageSum(m.payload, 16, 12)))
        }
        .toDF("media_id", "out_w", "out_h", "resized_sum")
        .orderBy(col("media_id"))
    },

    // ---- q_c41: perceptual-hash media near-dup ---------------------------
    // Near-duplicate detection for the IMAGE modality — the q_b5/q_c1
    // dedup story extended past text: byte-identity (md5) misses
    // re-encoded/perturbed copies, so the pipeline hashes DECODED pixels
    // with a perceptual average-hash (NN 8×8 resample → threshold at the
    // grid mean → 64-bit signature) and groups exact signature matches.
    // The fixture plants real families (same base image, per-id sparse
    // pixel noise — byte-different, perceptually identical) next to
    // unique singletons, so the operator fires non-vacuously both ways.
    //
    // 100 TB shape: encode→decode→hash is ONE mapPartitions pass with a
    // per-partition codec (payload bytes never shuffle, never reach the
    // driver); the only exchange is (media_id, 64-bit hash) rows — 16
    // bytes each — into a signature-keyed window whose partitions are
    // family-sized. The oracle replicates the hash in closed form from
    // the pixel generator, so a match proves the whole decode+resample+
    // threshold chain, not the arithmetic.
    QueryDef(
      "q_c41_media_neardup",
      Some("""WITH d AS (
             |  SELECT doc_id AS id,
             |    CASE WHEN (doc_id // 8) % 3 = 0 THEN doc_id * 1000003 + 500000009
             |         ELSE doc_id // 8 END AS base
             |  FROM documents),
             |dim AS (SELECT id, base, base % 56 + 8 AS w, base % 40 + 8 AS h FROM d),
             |gx AS (SELECT id, base, w, h, unnest(range(8)) AS x FROM dim),
             |gxy AS (SELECT id, base, w, h, x, unnest(range(8)) AS y FROM gx),
             |smp AS (
             |  SELECT id, x, y,
             |    (base * 31 + (x * w // 8) * 7 + (y * h // 8) * 13
             |     + CASE WHEN ((x * w // 8) * 31 + (y * h // 8) * 17 + id * 13) % 149 = 0
             |            THEN 1 ELSE 0 END) % 256 AS v
             |  FROM gxy),
             |tot AS (SELECT id, CAST(SUM(v) AS BIGINT) AS s FROM smp GROUP BY 1),
             |bits AS (
             |  SELECT smp.id,
             |    string_agg(CASE WHEN smp.v * 64 > t.s THEN '1' ELSE '0' END, ''
             |               ORDER BY smp.y * 8 + smp.x) AS ahash
             |  FROM smp JOIN tot t ON smp.id = t.id GROUP BY smp.id),
             |cl AS (SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_members,
             |              MIN(id) AS rep_id
             |       FROM bits GROUP BY 1)
             |SELECT b.id AS media_id, b.ahash, c.n_members, c.rep_id,
             |  CAST(CASE WHEN c.n_members > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_neardup
             |FROM bits b JOIN cl c USING (ahash)
             |ORDER BY media_id""".stripMargin)
    ) { (s, d) =>
      import s.implicits._
      val hashes = Tables(s, d, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val coder = new MediaCoder()
          it.map(id => (id, coder.imageAHash(coder.encodeNdImage(id))))
        }
        .toDF("media_id", "ahash")
      val fam = org.apache.spark.sql.expressions.Window.partitionBy(col("ahash"))
      hashes
        .select(col("media_id"), col("ahash"),
          count(lit(1)).over(fam).as("n_members"),
          min(col("media_id")).over(fam).as("rep_id"))
        .withColumn("is_neardup", when(col("n_members") > 1, 1L).otherwise(0L))
        .orderBy(col("media_id"))
    },

    // ---- q_c52: multimodal training-sample assembly ----------------------
    // The step that feeds a multimodal dataloader: per id, join the TEXT
    // record (token/char stats), the EMBEDDING record (q_c17's int8
    // footprint — dim, exact-decimal scale, integer checksums), and the
    // MEDIA record (REAL javax decode of the id's PNG/WAV/video payload:
    // unit count + decoded-value checksum) into one training row.
    //
    // 100 TB shape: each modality is its own map-side branch — text a
    // projection, embeddings per-row array folds, media a mapPartitions
    // decode with the per-partition codec (payload bytes never survive
    // the branch) — and the assembly is two id-keyed joins of slim
    // feature rows; with the three tables bucketed by id the joins are
    // co-partitioned shuffles. The oracle assembles the same record from
    // the q_c17 quantization CTEs and q_c11's closed-form decode
    // generators, so a match re-proves the real codec path inside the
    // joined result.
    QueryDef(
      "q_c52_sample_assembly",
      Some("""WITH txt AS (
             |  SELECT doc_id, source,
             |         CAST(len([w for w in string_split(lower(text), ' ') if len(w) > 0]) AS BIGINT) AS n_tokens,
             |         CAST(length(text) AS BIGINT) AS n_chars
             |  FROM documents),
             |m AS (
             |  SELECT vec_id,
             |         CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE) AS mx,
             |         len(embedding) AS dim
             |  FROM embeddings),
             |e AS (
             |  SELECT m.vec_id, m.mx, m.dim, unnest(emb.embedding) AS x
             |  FROM m JOIN embeddings emb ON m.vec_id = emb.vec_id),
             |q AS (
             |  SELECT vec_id, mx, dim,
             |         CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT) AS qi
             |  FROM e WHERE mx > 0),
             |emb AS (
             |  SELECT vec_id, CAST(dim AS BIGINT) AS emb_dim,
             |         CAST(CAST(mx / 127 AS DECIMAL(18,6)) AS DOUBLE) AS emb_scale,
             |         CAST(SUM(qi) AS BIGINT) AS emb_qsum
             |  FROM q GROUP BY vec_id, dim, mx),
             |img_d AS (SELECT doc_id, doc_id % 56 + 8 AS w, doc_id % 40 + 8 AS h
             |          FROM documents WHERE doc_id % 3 = 0),
             |img_x AS (SELECT doc_id, h, unnest(range(w)) AS x FROM img_d),
             |img_xy AS (SELECT doc_id, x, unnest(range(h)) AS y FROM img_x),
             |img AS (SELECT doc_id AS media_id, 'image' AS kind, COUNT(*) AS n_units,
             |               CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
             |        FROM img_xy GROUP BY doc_id),
             |aud_d AS (SELECT doc_id, doc_id % 800 + 100 AS n FROM documents WHERE doc_id % 3 = 1),
             |aud_i AS (SELECT doc_id, unnest(range(n)) AS i FROM aud_d),
             |aud AS (SELECT doc_id AS media_id, 'audio' AS kind, COUNT(*) AS n_units,
             |               CAST(SUM((doc_id * 7919 + i * 104729) % 65536 - 32768) AS BIGINT) AS value_sum
             |        FROM aud_i GROUP BY doc_id),
             |vid_d AS (SELECT doc_id, doc_id % 4 + 2 AS f FROM documents WHERE doc_id % 3 = 2),
             |vid_f AS (SELECT doc_id, f, unnest(range(f)) AS fr FROM vid_d),
             |vid_fx AS (SELECT doc_id, f, fr, unnest(range(16)) AS x FROM vid_f WHERE fr % 2 = 0),
             |vid_fxy AS (SELECT doc_id, f, fr, x, unnest(range(12)) AS y FROM vid_fx),
             |vid AS (SELECT doc_id AS media_id, 'video' AS kind, CAST(MAX(f) AS BIGINT) AS n_units,
             |               CAST(SUM((doc_id * 31 + fr * 17 + x * 7 + y * 13) % 256) AS BIGINT) AS value_sum
             |        FROM vid_fxy GROUP BY doc_id),
             |med AS (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid)
             |SELECT t.doc_id, t.source, t.n_tokens, t.n_chars,
             |       e.emb_dim, e.emb_scale, e.emb_qsum,
             |       md.kind, CAST(md.n_units AS BIGINT) AS n_units, md.value_sum
             |FROM txt t
             |JOIN emb e ON t.doc_id = e.vec_id
             |JOIN med md ON t.doc_id = md.media_id
             |ORDER BY t.doc_id""".stripMargin)
    ) { (s, d) =>
      val txt = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(expr("filter(split(lower(text), ' '), w -> length(w) > 0)"))
            .cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id"),
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))").as("mx"),
          size(col("embedding")).cast("long").as("emb_dim"),
          col("embedding"))
        .filter(col("mx") > 0)
        .select(col("vec_id"), col("emb_dim"),
          emitQ(col("mx") / 127d).as("emb_scale"),
          expr("aggregate(embedding, 0L, (a, x) -> a + CAST(round(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT))")
            .as("emb_qsum"))
      val med = decodeFeatures(encodedMedia(s, d)).toDF()
        .select(col("media_id"), col("kind"),
          col("n_units").cast("long").as("n_units"),
          col("value_sum").cast("long").as("value_sum"))
      txt
        .join(emb, txt("doc_id") === emb("vec_id"))
        .join(med, txt("doc_id") === med("media_id"))
        .select(txt("doc_id"), col("source"), col("n_tokens"), col("n_chars"),
          col("emb_dim"), col("emb_scale"), col("emb_qsum"),
          col("kind"), col("n_units"), col("value_sum"))
        .orderBy(col("doc_id"))
    }
  )
}
