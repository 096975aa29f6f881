package graft.plans

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

import graft.core.Geometry
import graft.core.Geometry.{Shape3, ShardTask, TrueShape}
import graft.meta.OmeNgff
import graft.sinks.ZarrV3
import graft.sources.{Hdf5Reader, Imaris}

/** IMS → OME-NGFF 0.5 Zarr v3 conversion as one Spark pipeline
  * (reference flows §3.1–3.3: `imaris_job.run_job` →
  * `imaris_to_zarr_distributed` / `..._translate_pyramid`).
  *
  * Execution shape (SURVEY §1.4 / §3):
  *  - planning is driver-side metadata-only (open each file once, read
  *    attrs + level shapes — reference `_build_global_shard_task_list`,
  *    `imaris_job.py:535-556`);
  *  - all store metadata (every level zarr.json + root OME metadata) is
  *    created by the DRIVER before the job launches — the reference's
  *    idempotent-create race workaround (W7, `imaris_to_zarr.py:1759-1831`)
  *    disappears because only one process initializes;
  *  - voxel work is a single `Dataset[ShardTask].mapPartitions` action:
  *    each task reads its input region (chunk-aligned, X1), encodes and
  *    writes exactly one shard file (W4/X3) and emits a stats row (A5);
  *  - pyramid levels are sequential Spark jobs (A3 — inter-level barrier
  *    is inherent: level l+1 reads level l).
  *
  * Scale posture: tasks are ~256 MB of voxels at the reference's default
  * shard (512³ uint16); 100 TB ⇒ ~400k tasks, far beyond any driver
  * bottleneck since a task row is ~100 bytes. No shuffle anywhere —
  * downsampling is block-local because shard % factor == 0 (X6).
  */
object ImarisToZarr {

  /** Job settings (reference `models.ImarisJobSettings`, `models.py:20-143`). */
  final case class Settings(
      shard: Shape3 = Shape3(512, 512, 512),
      chunk: Shape3 = Shape3(128, 256, 256),
      zstdLevel: Int = 3,
      codecName: String = "zstd",       // zstd (reference chain) | gzip
      // W1: zarr v2 legacy store (blosc chunks, one file per chunk) —
      // the reference's DEFAULT path (use_tensorstore=False,
      // models.py:91-98); 3 = sharded v3 (its tensorstore path)
      zarrFormat: Int = 3,
      bloscCname: String = "zstd",      // v2 chunk codec inside blosc
      bloscShuffle: Int = graft.sinks.Blosc.SHUFFLE,
      // v2 chunk-key layout: "." = flat (zarr-python default, what the
      // reference writes), "/" = nested directory store
      v2Separator: String = ".",
      translatePyramid: Boolean = true,   // models.py:99-108
      computeLevels: Int = 1,             // levels to materialize if not translating
      downsampleMode: String = "mean",    // stride|median|mode|mean|min|max (models.py:79-85)
      scaleFactor: Shape3 = Shape3(2, 2, 2),
      singleTileOnly: Boolean = false,    // models.py:131-143 (S3)
      // D6 two-mode partitioning (models.py:121-130): "shard" = one task
      // per (file, shard index) — sub-file parallelism; "file" = legacy
      // whole-file granularity, realized as a degenerate one-shard-per-
      // level grid (shard = chunk-aligned cover of the data)
      partitionMode: String = "shard",
      // read-wave task order across files: contiguous (default; reader-
      // cache-friendly) | interleave (reference D1 round-robin)
      taskOrder: String = "contiguous",
      // voxel-size precedence chain (imaris_job.py:362-403): manifest
      // value if present, else per-file Imaris metadata
      voxelSizeOverrideUm: Option[(Double, Double, Double)] = None,
      // tile translation from acquisition.json (imaris_job.py:256-307);
      // absent → Imaris ExtMin origin
      originOverrideUm: Option[(Double, Double, Double)] = None,
      // Fuse each level's reduction into the wave that already holds its
      // source in memory: the L0 read task emits its L1 partial for free,
      // and (round 9, recursively) each compute task emits the NEXT
      // level's partial from its reduced output — so every computed level
      // assembles partials (1/∏factor of the bytes, no chunk decode)
      // instead of re-reading the previous level's store. Requires the
      // source task shard to be factor-aligned (shard % scaleFactor == 0
      // per dim) so no output window crosses a source-task border; the
      // per-level gate auto-disables at any level whose clamped shard
      // breaks alignment. Pure plan substitution — output stores are
      // byte-identical (spec-asserted).
      fuseDownsample: Boolean = true
  )

  final case class ShardStats(
      file: String, level: Int, key: String, bytesWritten: Long, voxels: Long)

  /** Live progress accounting (reference A5 live path,
    * `imaris_to_zarr.py:1872-1882`): executor tasks add to these
    * accumulators as each shard lands; the driver logs a progress line
    * as completions stream in (see [[convertAll]]). Totals equal the
    * post-action stats by construction — the spec asserts it.
    */
  final case class Progress(
      shards: org.apache.spark.util.LongAccumulator,
      bytes: org.apache.spark.util.LongAccumulator)
  object Progress {
    def init(spark: SparkSession): Progress = Progress(
      spark.sparkContext.longAccumulator("graft.shards.written"),
      spark.sparkContext.longAccumulator("graft.bytes.written"))
  }

  /** Per-(source, level) write parameters an executor task resolves from
    * its ShardTask key — the pooled-wave analog of the per-level closure
    * captures in the old per-file loop.
    */
  private final case class TaskIo(
      origFile: String, store: String, chunk: Shape3, shard: Shape3,
      zstdLevel: Int, codec: String,
      zarrFormat: Int = 3, cname: String = "zstd", shuffle: Int = 1,
      separator: String = ".",
      // compute-wave extras (downsample source geometry)
      srcShape: Shape3 = Shape3(0, 0, 0), srcChunk: Shape3 = Shape3(0, 0, 0),
      srcShard: Shape3 = Shape3(0, 0, 0), factor: Shape3 = Shape3(1, 1, 1),
      mode: String = "mean",
      // fusion: non-empty → emit a partial reduction of the region this
      // task already holds (read wave: the L0 region; compute wave: its
      // reduced output) to `$partialDir/<sz>_<sy>_<sx>` for the NEXT
      // level's assembly (uses factor/mode)
      partialDir: String = "",
      // compute-wave: non-empty → assemble from the previous wave's
      // partials under this dir instead of decoding that level's store
      partialSrcDir: String = "")

  /** Deterministic discovery: recursive *.ims listing, *.h5 fallback,
    * lexicographic order, optional first-only (reference S1–S3,
    * `imaris_job.py:48-112`).
    */
  def discover(inputDir: String, singleTileOnly: Boolean,
               conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(inputDir)
    val fs = p.getFileSystem(conf)
    def walk(dir: Path): Seq[Path] = {
      val st = fs.listStatus(dir)
      st.toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq(s.getPath)
      }
    }
    val all = walk(p)
    val ims = all.filter(_.getName.endsWith(".ims"))
    val chosen = if (ims.nonEmpty) ims else all.filter(_.getName.endsWith(".h5"))
    val sorted = chosen.map(_.toString).sorted
    if (singleTileOnly) sorted.take(1) else sorted
  }

  /** Convert one Imaris file to `<outDir>/<stem>.ome.zarr`. Returns the
    * per-shard stats (already computed; caller may aggregate).
    */
  def convert(spark: SparkSession, imsPath: String, outDir: String,
              settings: Settings = Settings()): Seq[ShardStats] =
    convertAll(spark, Seq(imsPath), outDir, _ => settings)

  /** Convert MANY Imaris files with a GLOBAL pooled task list (reference
    * `_build_global_shard_task_list`, `imaris_job.py:535-556`): all
    * (file, level) read-from-IMS tasks across every input run as ONE
    * Spark job, so the cluster never idles in a small file's per-level
    * tail while other files still have work. Computed pyramid levels run
    * as one pooled job per LEVEL (the l−1 → l barrier is inherent), again
    * across all files at once.
    *
    * At 100 TB / 1000 executors this is the difference between ~n_files ×
    * n_levels tiny jobs (each with its own straggler tail) and
    * 1 + (levels−1) jobs whose ~400k pooled tasks bin-pack the cluster.
    */
  def convertAll(spark: SparkSession, imsPaths: Seq[String], outDir: String,
                 settingsFor: String => Settings,
                 progress: Option[Progress] = None): Seq[ShardStats] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val serConf = new SerializableConfiguration(hconf)

    // Fail before ANY metadata is written: Settings built directly via the
    // API bypass JobSettings.validated, and a bad separator caught only at
    // executor write time would leave a partially written store whose
    // .zarray files already carry the bogus dimension_separator.
    imsPaths.foreach { p =>
      val sep = settingsFor(p).v2Separator
      require(sep == "." || sep == "/",
        s"dimension_separator must be '.' or '/', got: $sep (input $p)")
    }

    // ---- driver-side planning + store init, metadata-only (W7→driver, W9, X9) ----
    final case class FilePlan(file: String, settings: Settings, store: String,
                              trueShapes: Seq[Shape3], specs: Seq[(Shape3, Shape3)])
    val plans = imsPaths.map { imsPath =>
      val settings = settingsFor(imsPath)
      val stem = imsPath.split('/').last.stripSuffix(".ims").stripSuffix(".h5")
      val store = s"$outDir/$stem.ome.zarr"
      val meta = Imaris.readMeta(imsPath, hconf)
      val nLevels =
        if (settings.translatePyramid) meta.numLevels else settings.computeLevels
      val factors: Seq[Shape3] =
        if (settings.translatePyramid) Geometry.stepFactors(meta.storedShapes)
        else Seq.fill(settings.computeLevels - 1)(settings.scaleFactor)
      val trueShapes: Seq[Shape3] =
        if (settings.translatePyramid) meta.trueShapes
        else factors.scanLeft(meta.trueShape0.shape)(Geometry.downsampledShape)
      val perLevelSpecs = trueShapes.map { ts =>
        if (settings.partitionMode == "file") {
          // whole-file mode: a single shard spanning the chunk-aligned
          // cover of the level ⇒ exactly one write task per (file, level)
          val (c, _) = Geometry.clampSpec(ts, settings.chunk, settings.shard)
          (c, Shape3(
            Geometry.ceilDiv(ts.z, c.z) * c.z,
            Geometry.ceilDiv(ts.y, c.y) * c.y,
            Geometry.ceilDiv(ts.x, c.x) * c.x))
        } else Geometry.clampSpec(ts, settings.chunk, settings.shard)
      }
      require(settings.zarrFormat == 2 || settings.zarrFormat == 3,
        s"zarr format must be 2|3, got: ${settings.zarrFormat}")
      require(settings.taskOrder == "contiguous" || settings.taskOrder == "interleave",
        s"task_order must be contiguous|interleave, got: ${settings.taskOrder}")
      if (settings.zarrFormat == 2)
        require(settings.zstdLevel >= 0 && settings.zstdLevel <= 9,
          s"blosc clevel must be in [0,9] for zarr v2, got: ${settings.zstdLevel}")
      trueShapes.zipWithIndex.foreach { case (ts, l) =>
        val (chunk, shard) = perLevelSpecs(l)
        if (settings.zarrFormat == 2)
          // v2 levels are 3-D (Z,Y,X) blosc-chunked arrays (reference
          // `create_dataset`, `imaris_to_zarr.py:948-967`); the shard is
          // only the TASK granularity, not part of the format
          ZarrV3.writeString(hconf, s"$store/$l/.zarray",
            graft.sinks.ZarrV2.arrayMetadata(
              Seq(ts.z, ts.y, ts.x), Seq(chunk.z, chunk.y, chunk.x),
              settings.bloscCname, settings.zstdLevel, settings.bloscShuffle,
              settings.v2Separator).render)
        else
          ZarrV3.writeString(hconf, s"$store/$l/zarr.json",
            ZarrV3.arrayMetadata(
              Seq(1L, 1L, ts.z, ts.y, ts.x),
              Seq(1L, 1L, shard.z, shard.y, shard.x),
              Seq(1L, 1L, chunk.z, chunk.y, chunk.x),
              settings.zstdLevel, settings.codecName).render)
      }
      val repFactor = Geometry.representativeFactor(
        if (settings.translatePyramid) meta.storedShapes else trueShapes)
      val voxel = settings.voxelSizeOverrideUm.getOrElse(meta.voxelSizeUm)
      val origin = Some(settings.originOverrideUm.getOrElse(meta.originUm))
      if (settings.zarrFormat == 2) {
        ZarrV3.writeString(hconf, s"$store/.zgroup",
          graft.sinks.ZarrV2.groupMetadata.render)
        // INTENTIONAL divergence from the reference's v2 path: it dumps the
        // full v3-shaped group dict (zarr_format:3, node_type,
        // attributes:{ome:...}) into .zattrs verbatim; we write only the
        // {"ome": ...} attributes object, which is what zarr v2 defines
        // .zattrs to hold and what v2 readers (zarr-python, ome-zarr-py)
        // expect. Byte-level .zattrs parity with reference v2 output is
        // NOT a goal; semantic parity of the ome block is spec-tested, and
        // ZarrMigrate lifts either flavor (it copies .zattrs verbatim).
        ZarrV3.writeString(hconf, s"$store/.zattrs",
          OmeNgff.omeAttributes(stem, nLevels,
            (repFactor.z, repFactor.y, repFactor.x), voxel, origin).render)
      } else
        ZarrV3.writeString(hconf, s"$store/zarr.json",
          OmeNgff.rootMetadata(stem, nLevels,
            (repFactor.z, repFactor.y, repFactor.x), voxel, origin).render)
      FilePlan(imsPath, settings, store, trueShapes, perLevelSpecs)
    }

    // ---- global task lists, planned up front (pure geometry) ----
    // level-(l+1) fusion precondition (see Settings.fuseDownsample): the
    // level-l TASK grid must be factor-aligned so no level-(l+1) output
    // window crosses a source-task border (file-mode's chunk-aligned
    // cover isn't; skip fusion there). l = 0 is the read wave; l ≥ 1 are
    // compute waves, which hold their reduced output in memory and emit
    // the NEXT level's partial for free — so every computed level
    // assembles partials instead of re-reading the previous level's
    // store (round 9 recursive fusion; the per-level gate lets a deep
    // level whose clamped shard breaks alignment fall back to the store
    // read without affecting other levels).
    def fusesLevel(p: FilePlan, srcLevel: Int): Boolean = {
      val f = p.settings.scaleFactor
      val shardL = p.specs(srcLevel)._2
      p.settings.fuseDownsample && !p.settings.translatePyramid &&
        p.settings.computeLevels >= srcLevel + 2 &&
        p.settings.partitionMode == "shard" &&
        shardL.z % f.z == 0 && shardL.y % f.y == 0 && shardL.x % f.x == 0
    }
    def partialDir(p: FilePlan, level: Int): String = s"${p.store}/$level/.partial"
    // every partial dir this plan COULD use (any run mode): stale-scratch
    // cleanup must not depend on the current run's fusion decisions
    def allPartialDirs(p: FilePlan): Seq[String] =
      (1 until math.max(2, p.settings.computeLevels)).map(partialDir(p, _))

    // wave A: every (file, level) that reads from IMS, pooled
    val readIo: Map[(String, Int), TaskIo] = plans.flatMap { p =>
      val readLevels =
        if (p.settings.translatePyramid) p.trueShapes.indices else Seq(0)
      readLevels.map { l =>
        val (chunkL, shardL) = p.specs(l)
        (p.file, l) -> TaskIo(p.file, p.store, chunkL, shardL,
          p.settings.zstdLevel, p.settings.codecName,
          p.settings.zarrFormat, p.settings.bloscCname, p.settings.bloscShuffle,
          p.settings.v2Separator,
          factor = p.settings.scaleFactor, mode = p.settings.downsampleMode,
          partialDir = if (l == 0 && fusesLevel(p, 0)) partialDir(p, 1) else "")
      }
    }.toMap
    val readTasksContiguous: Seq[ShardTask] = plans.flatMap { p =>
      val readLevels =
        if (p.settings.translatePyramid) p.trueShapes.indices else Seq(0)
      readLevels.flatMap(l =>
        Geometry.shardTasks(p.file, l, TrueShape(p.trueShapes(l)), p.specs(l)._2))
    }
    // Task order across files (reference D1 round-robins; we default to
    // contiguous). A wave has ONE order: interleave wins when ANY plan
    // requests it (per-file mixing is not meaningful for a pooled list). Contiguous keeps a file's tasks in few partitions —
    // per-partition reader/chunk-index caches hit and each file's open
    // stream count stays low. Interleave spreads every file across all
    // partitions. Measured on 3x 1.28 GB files at local[32] (4 runs
    // each, PERF round 6): the two are statistically indistinguishable
    // under this sandbox's run-to-run variance (contiguous 28.8-57.8s,
    // interleave 28.7-35.0s, overlapping ranges); default stays
    // contiguous for the cache locality, the knob stays for
    // skewed-file-size workloads where round-robin balances tails.
    val readTasks: Seq[ShardTask] =
      if (plans.exists(_.settings.taskOrder == "interleave")) {
        val byFile = readTasksContiguous.groupBy(_.file).values.map(_.iterator).toSeq
        val out = Seq.newBuilder[ShardTask]
        var remaining = byFile
        while (remaining.nonEmpty) {
          remaining.foreach(it => if (it.hasNext) out += it.next())
          remaining = remaining.filter(_.hasNext)
        }
        out.result()
      } else readTasksContiguous
    // waves B..: one per computed pyramid level, pooled across files;
    // tasks are keyed by their SOURCE level directory (unique per store)
    val maxCompute = (1 +: plans.map(p =>
      if (p.settings.translatePyramid) 1 else p.settings.computeLevels)).max
    val computeWaves: Seq[(Seq[ShardTask], Map[(String, Int), TaskIo])] =
      (1 until maxCompute).map { level =>
        val wave = plans.filter(p =>
          !p.settings.translatePyramid && level < p.settings.computeLevels)
        val io = wave.map { p =>
          val (chunkL, shardL) = p.specs(level)
          val (srcChunk, srcShard) = p.specs(level - 1)
          (s"${p.store}/${level - 1}", level) -> TaskIo(
            p.file, p.store, chunkL, shardL,
            p.settings.zstdLevel, p.settings.codecName,
            p.settings.zarrFormat, p.settings.bloscCname, p.settings.bloscShuffle,
            p.settings.v2Separator,
            srcShape = p.trueShapes(level - 1), srcChunk = srcChunk,
            srcShard = srcShard, factor = p.settings.scaleFactor,
            mode = p.settings.downsampleMode,
            // consume partials iff the wave that produced level-1 emitted
            // them; emit partials for level+1 iff THIS wave's task grid
            // is aligned and a next computed level exists
            partialDir = if (fusesLevel(p, level)) partialDir(p, level + 1) else "",
            partialSrcDir = if (fusesLevel(p, level - 1)) partialDir(p, level) else "")
        }.toMap
        val tasks = wave.flatMap(p => Geometry.shardTasks(
          s"${p.store}/${level - 1}", level,
          TrueShape(p.trueShapes(level)), p.specs(level)._2))
        (tasks, io)
      }

    // ---- live progress: log as shard completions stream in (A5) ----
    val totalTasks = readTasks.size + computeWaves.map(_._1.size).sum
    val listener = progress.map { p =>
      val logEvery = math.max(1L, totalTasks / 10L)
      val lastLogged = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val done = p.shards.value
          if (done / logEvery > lastLogged.getAndSet(done) / logEvery)
            println(s"[ims-to-zarr] progress: $done/$totalTasks shards, " +
              s"${p.bytes.value} bytes")
        }
      }
      spark.sparkContext.addSparkListener(l)
      l
    }

    // drop any fused-reduction scratch left by a PREVIOUS failed run
    // regardless of THIS run's fusion mode: a crash between a wave and
    // cleanup leaves `<store>/<l>/.partial` on disk, and a later
    // successful run (fused or not) must not ship it — the finished-store
    // invariant is "spec-defined keys only". Also guards the fused path
    // against assembling stale partials from an aborted earlier attempt.
    plans.foreach { p =>
      allPartialDirs(p).foreach { d =>
        val dir = new org.apache.hadoop.fs.Path(d)
        val fs = dir.getFileSystem(hconf)
        if (fs.exists(dir)) fs.delete(dir, true)
      }
    }

    try {
      val allStats = scala.collection.mutable.ArrayBuffer.empty[ShardStats]
      allStats ++= runReadWave(spark, readTasks, readIo, serConf, progress)
      for ((tasks, io) <- computeWaves)
        allStats ++= runComputeWave(spark, tasks, io, serConf, progress)
      allStats.toSeq
    } finally {
      listener.foreach(spark.sparkContext.removeSparkListener)
      // fused-reduction scratch is consumed by the next level's wave;
      // remove every level's dir even on failure so a partially written
      // store never carries non-spec keys into a rerun
      plans.foreach { p =>
        allPartialDirs(p).foreach { d =>
          val dir = new org.apache.hadoop.fs.Path(d)
          try dir.getFileSystem(hconf).delete(dir, true)
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  /** Memory-aware wave parallelism: a shard task holds its whole voxel
    * region (plus decode/encode scratch, ~3× the region) live on the
    * heap, so the number of CONCURRENT tasks per executor must be sized
    * to the executor heap, not just its core count — the spill-aware
    * sizing rule applied to this operator. Measured on this harness
    * (512³ uint16 shards = 268 MB regions, 8 GB heap): 6 concurrent
    * tasks convert 2.45 GB in ~100 s; 8–10 concurrent take 200–350 s —
    * concurrent humongous allocations fall off a page-fault cliff long
    * before the heap OOMs. Tasks beyond the cap queue inside the wave's
    * partitions and run back-to-back, so throughput stays smooth.
    * `maxTaskBytes` is the largest task's live-region estimate; the cap
    * uses half the heap. On a real cluster the same arithmetic applies
    * per executor (heap from spark.executor.memory); here local-mode
    * driver heap IS the executor heap.
    */
  private[plans] def memoryCappedParallelism(
      spark: SparkSession, nTasks: Int, maxTaskBytes: Long): Int = {
    val slots = spark.sparkContext.defaultParallelism
    val heap = Runtime.getRuntime.maxMemory
    val cap = math.max(1L, heap * 3 / 5 / math.max(1L, maxTaskBytes)).toInt
    math.max(1, math.min(nTasks, math.min(slots, cap)))
  }

  /** One pooled Spark job over every read-from-IMS task (all files, all
    * translated levels).
    */
  private def runReadWave(
      spark: SparkSession, tasks: Seq[ShardTask], io: Map[(String, Int), TaskIo],
      serConf: SerializableConfiguration,
      progress: Option[Progress]): Seq[ShardStats] = {
    if (tasks.isEmpty) return Seq.empty
    import spark.implicits._
    // region bytes (uint16) + ~2× decode/encode scratch
    val maxTaskBytes = tasks.map(t =>
      (t.z1 - t.z0) * (t.y1 - t.y0) * (t.x1 - t.x0) * 2L).max * 3
    val parallelism = memoryCappedParallelism(spark, tasks.size, maxTaskBytes)
    // parallelize slices the task list directly — repartition() would
    // add the conversion path's ONLY shuffle for nothing (and local-mode
    // shuffle RPC stalls for minutes under gVisor on multi-GB runs).
    // flatMap order groups a file's tasks contiguously, so most
    // partitions touch few files and the per-partition reader cache hits.
    val taskDs: Dataset[ShardTask] =
      spark.createDataset(spark.sparkContext.parallelize(tasks, parallelism))
    taskDs.mapPartitions { it =>
      // one reader per (partition, file): the reference holds one HDF5
      // handle per worker-file (D5, `imaris_job.py:601-609`); the chunk
      // index is cached per (file, level) — re-walking the B-tree per
      // task would multiply metadata I/O by the task count
      val readers = scala.collection.mutable.Map.empty[String, Hdf5Reader]
      val datasets = scala.collection.mutable.Map.empty[(String, Int), Hdf5Reader.Dataset]
      // close on task completion, not iterator exhaustion — a failure
      // mid-partition would otherwise leak the open input streams
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => readers.values.foreach(_.close())))
      // ONE region buffer per partition, reused across its tasks: a fresh
      // 268 MB humongous array per 512³ task was the pipeline's dominant
      // allocation (and concurrent humongous allocation is pathologically
      // slow under syscall-intercepting sandboxes)
      var regionBuf: Array[Short] = Array.emptyShortArray
      var partialBuf: Array[Short] = Array.emptyShortArray
      lazy val partialScratch = new PartialStore.Scratch
      it.map { t =>
        val spec = io((t.file, t.level))
        val r = readers.getOrElseUpdate(t.file, new Hdf5Reader(t.file, serConf.value))
        val ds = datasets.getOrElseUpdate((t.file, t.level),
          r.openDataset(Imaris.dataPath(t.level)))
        val nVox = ((t.z1 - t.z0) * (t.y1 - t.y0) * (t.x1 - t.x0)).toInt
        if (regionBuf.length < nVox) regionBuf = new Array[Short](nVox)
        val data = r.readRegionInto(ds, t.z0, t.z1, t.y0, t.y1, t.x0, t.x1, regionBuf)
        val dataShape = Shape3(t.z1 - t.z0, t.y1 - t.y0, t.x1 - t.x0)
        // streaming encode+write: peak task state is the voxel region +
        // one chunk, not an extra fully-assembled shard buffer — wide
        // executors stay far from the GC wall
        val (key, written) =
          if (spec.zarrFormat == 2) {
            val w = graft.sinks.ZarrV2.writeRegionChunks(
              serConf.value, s"${spec.store}/${t.level}", data, dataShape,
              Shape3(t.z0, t.y0, t.x0), spec.chunk,
              spec.cname, spec.zstdLevel, spec.shuffle, spec.separator)
            (graft.sinks.ZarrV2.chunkKey(t.sz, t.sy, t.sx, spec.separator), w)
          } else {
            val k = ZarrV3.shardKey(t.sz, t.sy, t.sx)
            val w = ZarrV3.writeShard(serConf.value, s"${spec.store}/${t.level}/$k",
              data, dataShape, spec.shard, spec.chunk, spec.zstdLevel, spec.codec)
            (k, w)
          }
        // fused level-1 partial: reduce the region we already hold and
        // stash it for the level-1 assembly wave (Settings.fuseDownsample).
        // Task borders are factor-aligned (planner precondition), so every
        // output window is wholly local and the partial is exact.
        if (spec.partialDir.nonEmpty) {
          val f = spec.factor
          val pShape = Shape3(
            Geometry.ceilDiv(t.z1, f.z) - t.z0 / f.z,
            Geometry.ceilDiv(t.y1, f.y) - t.y0 / f.y,
            Geometry.ceilDiv(t.x1, f.x) - t.x0 / f.x)
          if (partialBuf.length < pShape.voxels)
            partialBuf = new Array[Short](pShape.voxels.toInt)
          Downsample.reduceInto(data, dataShape, pShape, f, spec.mode, partialBuf)
          PartialStore.write(serConf.value,
            s"${spec.partialDir}/${t.sz}_${t.sy}_${t.sx}", partialBuf, pShape,
            partialScratch)
        }
        progress.foreach { p => p.shards.add(1L); p.bytes.add(written) }
        ShardStats(t.file, t.level, key, written, dataShape.voxels)
      }
    }.collect().toSeq
  }

  /** One pooled Spark job downsampling level l−1 → l across all files. */
  private def runComputeWave(
      spark: SparkSession, tasks: Seq[ShardTask], io: Map[(String, Int), TaskIo],
      serConf: SerializableConfiguration,
      progress: Option[Progress]): Seq[ShardStats] = {
    if (tasks.isEmpty) return Seq.empty
    import spark.implicits._
    // the downsample task holds the ×factor SOURCE region + the output —
    // unless it assembles read-wave partials, which needs only the output
    // region plus one already-reduced partial as scratch
    val maxTaskBytes = tasks.map { t =>
      val spec = io((t.file, t.level))
      val f = spec.factor
      if (spec.partialSrcDir.nonEmpty) {
        val partialVox = spec.srcShard.voxels / math.max(1L, f.z * f.y * f.x)
        ((t.z1 - t.z0) * (t.y1 - t.y0) * (t.x1 - t.x0) + partialVox) * 2L
      } else
        (t.z1 - t.z0) * f.z * (t.y1 - t.y0) * f.y * (t.x1 - t.x0) * f.x * 2L
    }.max * 3
    val taskDs = spark.createDataset(spark.sparkContext.parallelize(
      tasks, memoryCappedParallelism(spark, tasks.size, maxTaskBytes)))
    taskDs.mapPartitions { it =>
      // per-partition source/output buffers reused across the partition's
      // tasks — the same humongous-allocation avoidance as the read wave
      // (round 5), applied to the downsample wave: a 512³ compute task
      // otherwise allocates a fresh ×8 source region per task
      var srcBuf: Array[Short] = Array.emptyShortArray
      lazy val partialScratch = new PartialStore.Scratch
      var dstBuf: Array[Short] = Array.emptyShortArray
      var partialBuf: Array[Short] = Array.emptyShortArray
      it.map { t =>
      val spec = io((t.file, t.level))
      val f = spec.factor
      val src = spec.srcShape
      val dataShape = Shape3(t.z1 - t.z0, t.y1 - t.y0, t.x1 - t.x0)
      if (dstBuf.length < dataShape.voxels) dstBuf = new Array[Short](dataShape.voxels.toInt)
      val reduced = if (spec.partialSrcDir.nonEmpty) {
        // FUSED path: the read wave already reduced each L0 task's region;
        // assemble this task's output from the overlapping partials — a
        // plain region copy over 1/∏factor of the source bytes, with no
        // L0 chunk decode. Partial (gz,gy,gx) covers the L1 region that is
        // the image of L0 task [g·shard, (g+1)·shard) under ÷factor.
        val g = spec.srcShard
        var gz = t.z0 * f.z / g.z
        while (gz * g.z < t.z1 * f.z && gz * g.z < src.z) {
          var gy = t.y0 * f.y / g.y
          while (gy * g.y < t.y1 * f.y && gy * g.y < src.y) {
            var gx = t.x0 * f.x / g.x
            while (gx * g.x < t.x1 * f.x && gx * g.x < src.x) {
              val pz0 = gz * g.z / f.z
              val pz1 = Geometry.ceilDiv(math.min((gz + 1) * g.z, src.z), f.z)
              val py0 = gy * g.y / f.y
              val py1 = Geometry.ceilDiv(math.min((gy + 1) * g.y, src.y), f.y)
              val px0 = gx * g.x / f.x
              val px1 = Geometry.ceilDiv(math.min((gx + 1) * g.x, src.x), f.x)
              val pShape = Shape3(pz1 - pz0, py1 - py0, px1 - px0)
              if (srcBuf.length < pShape.voxels)
                srcBuf = new Array[Short](pShape.voxels.toInt)
              PartialStore.readInto(serConf.value,
                s"${spec.partialSrcDir}/${gz}_${gy}_$gx", pShape, srcBuf,
                partialScratch)
              // copy the intersection of the partial with this task's region
              val izLo = math.max(t.z0, pz0); val izHi = math.min(t.z1, pz1)
              val iyLo = math.max(t.y0, py0); val iyHi = math.min(t.y1, py1)
              val ixLo = math.max(t.x0, px0); val ixHi = math.min(t.x1, px1)
              var z = izLo
              while (z < izHi) {
                var y = iyLo
                while (y < iyHi) {
                  val sBase = (((z - pz0) * pShape.y + (y - py0)) * pShape.x + (ixLo - px0)).toInt
                  val dBase = (((z - t.z0) * dataShape.y + (y - t.y0)) * dataShape.x + (ixLo - t.x0)).toInt
                  val run = (ixHi - ixLo).toInt
                  var i = 0
                  while (i < run) { dstBuf(dBase + i) = srcBuf(sBase + i); i += 1 }
                  y += 1
                }
                z += 1
              }
              gx += 1
            }
            gy += 1
          }
          gz += 1
        }
        dstBuf
      } else {
        // read the ×factor source region from level l-1's shards
        val sz0 = t.z0 * f.z; val sz1 = math.min(t.z1 * f.z, src.z)
        val sy0 = t.y0 * f.y; val sy1 = math.min(t.y1 * f.y, src.y)
        val sx0 = t.x0 * f.x; val sx1 = math.min(t.x1 * f.x, src.x)
        val nSrc = ((sz1 - sz0) * (sy1 - sy0) * (sx1 - sx0)).toInt
        if (srcBuf.length < nSrc) srcBuf = new Array[Short](nSrc)
        val srcData =
          if (spec.zarrFormat == 2)
            graft.sinks.ZarrV2.readRegionInto(
              serConf.value, t.file, src, spec.srcChunk,
              sz0, sz1, sy0, sy1, sx0, sx1, srcBuf, spec.separator)
          else ZarrRegion.readInto(
            serConf.value, t.file, src, spec.srcShard, spec.srcChunk,
            sz0, sz1, sy0, sy1, sx0, sx1, srcBuf)
        Downsample.reduceInto(
          srcData, Shape3(sz1 - sz0, sy1 - sy0, sx1 - sx0), dataShape, f, spec.mode, dstBuf)
      }
      val (key, written) =
        if (spec.zarrFormat == 2) {
          val w = graft.sinks.ZarrV2.writeRegionChunks(
            serConf.value, s"${spec.store}/${t.level}", reduced, dataShape,
            Shape3(t.z0, t.y0, t.x0), spec.chunk,
            spec.cname, spec.zstdLevel, spec.shuffle, spec.separator)
          (graft.sinks.ZarrV2.chunkKey(t.sz, t.sy, t.sx, spec.separator), w)
        } else {
          val k = ZarrV3.shardKey(t.sz, t.sy, t.sx)
          val w = ZarrV3.writeShard(serConf.value, s"${spec.store}/${t.level}/$k",
            reduced, dataShape, spec.shard, spec.chunk, spec.zstdLevel, spec.codec)
          (k, w)
        }
      // recursive fusion (round 9): this task already holds its reduced
      // level-l output, so emit the level-(l+1) partial the same way the
      // read wave does for level 1 — task borders are factor-aligned
      // (planner precondition), so every next-level output window is
      // wholly local and the partial is exact. The next wave then
      // assembles partials instead of re-reading THIS level's store.
      if (spec.partialDir.nonEmpty) {
        val pShape = Shape3(
          Geometry.ceilDiv(t.z1, f.z) - t.z0 / f.z,
          Geometry.ceilDiv(t.y1, f.y) - t.y0 / f.y,
          Geometry.ceilDiv(t.x1, f.x) - t.x0 / f.x)
        if (partialBuf.length < pShape.voxels)
          partialBuf = new Array[Short](pShape.voxels.toInt)
        Downsample.reduceInto(reduced, dataShape, pShape, f, spec.mode, partialBuf)
        PartialStore.write(serConf.value,
          s"${spec.partialDir}/${t.sz}_${t.sy}_${t.sx}", partialBuf, pShape,
          partialScratch)
      }
      progress.foreach { p => p.shards.add(1L); p.bytes.add(written) }
      // stats are keyed by the ORIGINAL ims path (not the source level
      // dir) so callers can aggregate per input file across waves
      ShardStats(spec.origFile, t.level, key, written, dataShape.voxels)
      }
    }.collect().toSeq
  }
}

/** Scratch store for fused level-1 partial reductions (one blob per L0
  * read task): 12-byte header of int32-BE dims, then a zstd-1 compressed
  * little-endian int16 payload. Lives at `<store>/1/.partial/` between the
  * read wave and the level-1 assembly wave, deleted by the driver after.
  * zstd level 1 (not the store's clevel): this data is written once, read
  * once, and deleted — cheap-to-encode beats small-on-disk.
  */
object PartialStore {
  import graft.core.Geometry.Shape3
  import com.github.luben.zstd.Zstd

  /** Grow-only byte scratch for [[write]]/[[readInto]]: one per partition,
    * reused across tasks — the raw int16 image of a 512³/2× partial is
    * ~33 MB, and a fresh copy (plus a compressed copy, plus a header
    * concat) per task would recreate exactly the per-task humongous-
    * allocation churn the wave's regionBuf/partialBuf reuse eliminates.
    */
  final class Scratch {
    private[PartialStore] var raw: Array[Byte] = Array.emptyByteArray
    private[PartialStore] var packed: Array[Byte] = Array.emptyByteArray
    private[PartialStore] def ensure(n: Int, bound: Int): Unit = {
      if (raw.length < n) raw = new Array[Byte](n)
      if (packed.length < 12 + bound) packed = new Array[Byte](12 + bound)
    }
  }

  def write(conf: org.apache.hadoop.conf.Configuration, path: String,
            data: Array[Short], shape: Shape3, scratch: Scratch): Unit = {
    val n = shape.voxels.toInt
    val bound = Zstd.compressBound(n.toLong * 2).toInt
    scratch.ensure(n * 2, bound)
    val raw = scratch.raw
    var i = 0
    while (i < n) {
      val v = data(i)
      raw(2 * i) = (v & 0xff).toByte
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // header + payload share one reused buffer: int32-BE dims at [0,12),
    // zstd-1 stream compressed directly at offset 12 — zero extra copies
    val dst = scratch.packed
    val bb = java.nio.ByteBuffer.wrap(dst, 0, 12)
    bb.putInt(shape.z.toInt).putInt(shape.y.toInt).putInt(shape.x.toInt)
    val m = Zstd.compressByteArray(dst, 12, dst.length - 12, raw, 0, n * 2, 1).toInt
    graft.sinks.ZarrV3.write(conf, path, dst, 12 + m)
  }

  /** Read a partial into a caller-owned (possibly oversized, REUSED)
    * buffer; the stored dims must equal `expect` (planner geometry).
    */
  def readInto(conf: org.apache.hadoop.conf.Configuration, path: String,
               expect: Shape3, out: Array[Short], scratch: Scratch): Array[Short] = {
    val bytes = graft.sinks.ZarrV3.read(conf, path)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val got = Shape3(bb.getInt.toLong, bb.getInt.toLong, bb.getInt.toLong)
    require(got == expect, s"partial $path dims $got, planner expected $expect")
    val n = got.voxels.toInt
    require(out.length >= n, s"partial buffer ${out.length} < $n")
    scratch.ensure(n * 2, 0)
    val raw = scratch.raw
    val m = Zstd.decompressByteArray(raw, 0, n * 2, bytes, 12, bytes.length - 12)
    require(m == n * 2, s"partial $path expanded to $m, want ${n * 2}")
    var i = 0
    while (i < n) {
      out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }
}

/** Region reader over our own Zarr v3 sharded level (used by the compute
  * pyramid path and the round-trip tests).
  */
object ZarrRegion {
  import graft.core.Geometry.Shape3

  def read(conf: org.apache.hadoop.conf.Configuration,
           levelDir: String, shape: Shape3, shard: Shape3, chunk: Shape3,
           z0: Long, z1: Long, y0: Long, y1: Long, x0: Long, x1: Long): Array[Short] =
    readInto(conf, levelDir, shape, shard, chunk, z0, z1, y0, y1, x0, x1,
      new Array[Short](((z1 - z0) * (y1 - y0) * (x1 - x0)).toInt))

  /** [[read]] into a caller-owned (possibly oversized, REUSED) region
    * buffer; one shard-decode scratch is also reused across the region's
    * shards. Returns `out`.
    */
  def readInto(conf: org.apache.hadoop.conf.Configuration,
               levelDir: String, shape: Shape3, shard: Shape3, chunk: Shape3,
               z0: Long, z1: Long, y0: Long, y1: Long, x0: Long, x1: Long,
               out: Array[Short]): Array[Short] = {
    val nz = (z1 - z0).toInt; val ny = (y1 - y0).toInt; val nx = (x1 - x0).toInt
    require(out.length >= nz.toLong * ny * nx,
      s"region buffer ${out.length} < ${nz.toLong * ny * nx}")
    var shardBuf: Array[Short] = Array.emptyShortArray
    var gz = z0 / shard.z
    while (gz * shard.z < z1) {
      var gy = y0 / shard.y
      while (gy * shard.y < y1) {
        var gx = x0 / shard.x
        while (gx * shard.x < x1) {
          val s0z = gz * shard.z; val s0y = gy * shard.y; val s0x = gx * shard.x
          val dShape = Shape3(
            math.min(shard.z, shape.z - s0z),
            math.min(shard.y, shape.y - s0y),
            math.min(shard.x, shape.x - s0x))
          val path = s"$levelDir/${ZarrV3.shardKey(gz, gy, gx)}"
          if (shardBuf.length < dShape.voxels) shardBuf = new Array[Short](dShape.voxels.toInt)
          val data = ZarrV3.decodeShardInto(ZarrV3.read(conf, path), dShape, shard, chunk, shardBuf)
          val izLo = math.max(z0, s0z); val izHi = math.min(z1, s0z + dShape.z)
          val iyLo = math.max(y0, s0y); val iyHi = math.min(y1, s0y + dShape.y)
          val ixLo = math.max(x0, s0x); val ixHi = math.min(x1, s0x + dShape.x)
          var z = izLo
          while (z < izHi) {
            var y = iyLo
            while (y < iyHi) {
              val srcBase = (((z - s0z) * dShape.y + (y - s0y)) * dShape.x + (ixLo - s0x)).toInt
              val dstBase = (((z - z0) * ny + (y - y0)) * nx + (ixLo - x0)).toInt
              var i = 0
              val run = (ixHi - ixLo).toInt
              while (i < run) { out(dstBase + i) = data(srcBase + i); i += 1 }
              y += 1
            }
            z += 1
          }
          gx += 1
        }
        gy += 1
      }
      gz += 1
    }
    out
  }
}

/** Windowed spatial reduce kernel (reference A1,
  * `create_downsample_dataset` `imaris_to_zarr.py:532-674`; modes doc
  * `:563-570`). Runs block-local inside one task — no shuffle (X6).
  *
  * Tie-breaking (documented, deterministic — the reference delegates to
  * TensorStore): `median` of an even window = lower middle of the sorted
  * window; `mode` = smallest value among the most frequent.
  */
object Downsample {
  import graft.core.Geometry.Shape3

  def reduce(src: Array[Short], srcShape: Shape3, dstShape: Shape3,
             f: Shape3, mode: String): Array[Short] =
    reduceInto(src, srcShape, dstShape, f, mode,
      new Array[Short](dstShape.voxels.toInt))

  /** [[reduce]] into a caller-owned (possibly oversized, REUSED) output
    * buffer; every dstShape cell is written, so stale tail bytes beyond
    * the extent are never read downstream. Returns `out`.
    */
  def reduceInto(src: Array[Short], srcShape: Shape3, dstShape: Shape3,
                 f: Shape3, mode: String, out: Array[Short]): Array[Short] = {
    require(out.length >= dstShape.voxels,
      s"reduce buffer ${out.length} < ${dstShape.voxels}")
    val window = new Array[Int]((f.z * f.y * f.x).toInt)
    var dz = 0L
    while (dz < dstShape.z) {
      var dy = 0L
      while (dy < dstShape.y) {
        var dx = 0L
        while (dx < dstShape.x) {
          var n = 0
          var wz = dz * f.z
          val wzHi = math.min(wz + f.z, srcShape.z)
          while (wz < wzHi) {
            var wy = dy * f.y
            val wyHi = math.min(wy + f.y, srcShape.y)
            while (wy < wyHi) {
              var wx = dx * f.x
              val wxHi = math.min(wx + f.x, srcShape.x)
              val base = ((wz * srcShape.y + wy) * srcShape.x).toInt
              while (wx < wxHi) {
                window(n) = src(base + wx.toInt) & 0xffff
                n += 1; wx += 1
              }
              wy += 1
            }
            wz += 1
          }
          val v: Int = mode match {
            case "stride" => window(0)
            case "mean" =>
              var s = 0L; var i = 0
              while (i < n) { s += window(i); i += 1 }
              (s / n).toInt
            case "min" =>
              var m = window(0); var i = 1
              while (i < n) { if (window(i) < m) m = window(i); i += 1 }
              m
            case "max" =>
              var m = window(0); var i = 1
              while (i < n) { if (window(i) > m) m = window(i); i += 1 }
              m
            case "median" =>
              val w = java.util.Arrays.copyOf(window, n)
              java.util.Arrays.sort(w)
              w((n - 1) / 2)
            case "mode" =>
              val w = java.util.Arrays.copyOf(window, n)
              java.util.Arrays.sort(w)
              var best = w(0); var bestCnt = 1
              var cur = w(0); var curCnt = 1
              var i = 1
              while (i < n) {
                if (w(i) == cur) curCnt += 1
                else { cur = w(i); curCnt = 1 }
                if (curCnt > bestCnt) { best = cur; bestCnt = curCnt }
                i += 1
              }
              best
            case other => sys.error(s"unknown downsample mode: $other")
          }
          out(((dz * dstShape.y + dy) * dstShape.x + dx).toInt) = v.toShort
          dx += 1
        }
        dy += 1
      }
      dz += 1
    }
    out
  }
}
