package graft

import org.apache.spark.sql.SparkSession

import graft.core.Geometry.Shape3
import graft.plans.{ImarisToZarr, Manifest}

/** CLI entrypoint for the IMS → OME-Zarr batch job (reference O1/O2:
  * `job_entrypoint` + `run_job`, `imaris_job.py:719-770`).
  *
  * Usage (spark-submit or sbt runMain):
  * {{{
  * graft.ImsToZarrJob --input DIR --output DIR
  *   [--shard Z,Y,X] [--chunk Z,Y,X] [--levels N] [--mode mean]
  *   [--no-translate] [--single-tile] [--zstd-level 3]
  * }}}
  *
  * The external-scheduler partitioning contract (O5: SLURM array id →
  * `partition_to_process`) is intentionally dropped — Spark owns
  * placement; run ONE job over all files instead of N mod-N slices.
  */
object ImsToZarrJob {

  final case class Args(
      input: String = "",
      output: String = "",
      shard: Shape3 = Shape3(512, 512, 512),
      chunk: Shape3 = Shape3(128, 256, 256),
      levels: Int = 1,
      mode: String = "mean",
      translate: Boolean = true,
      singleTile: Boolean = false,
      zstdLevel: Int = 3)

  private def parseShape(s: String): Shape3 = {
    val p = s.split(",").map(_.trim.toLong)
    require(p.length == 3, s"expected Z,Y,X, got: $s")
    Shape3(p(0), p(1), p(2))
  }

  def parseArgs(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input"       => a = a.copy(input = argv(i + 1)); i += 2
        case "--output"      => a = a.copy(output = argv(i + 1)); i += 2
        case "--shard"       => a = a.copy(shard = parseShape(argv(i + 1))); i += 2
        case "--chunk"       => a = a.copy(chunk = parseShape(argv(i + 1))); i += 2
        case "--levels"      => a = a.copy(levels = argv(i + 1).toInt); i += 2
        case "--mode"        => a = a.copy(mode = argv(i + 1)); i += 2
        case "--zstd-level"  => a = a.copy(zstdLevel = argv(i + 1).toInt); i += 2
        case "--no-translate" => a = a.copy(translate = false); i += 1
        case "--single-tile" => a = a.copy(singleTile = true); i += 1
        case other           => sys.error(s"unknown arg: $other")
      }
    }
    require(a.input.nonEmpty && a.output.nonEmpty, "--input and --output are required")
    a
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val builder = SparkSession.builder()
      .appName("graft-ims-to-zarr")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default to local cores otherwise
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val hconf = spark.sparkContext.hadoopConfiguration

    val stacks = ImarisToZarr.discover(a.input, a.singleTile, hconf)
    if (stacks.isEmpty) { println("No stacks to process!"); return }
    // output stores are keyed by basename; two tiles with the same name in
    // different subdirectories would silently clobber each other's shards
    val dupes = stacks.groupBy(_.split('/').last).filter(_._2.length > 1)
    require(dupes.isEmpty,
      s"duplicate stack basenames would overwrite each other: ${dupes.keys.mkString(", ")}")

    // acquisition.json lives one directory above input_source
    // (imaris_job.py:362-367); voxel-size precedence: manifest → Imaris
    val manifest = Manifest.readJson(
      hconf, s"${a.input.stripSuffix("/").split('/').dropRight(1).mkString("/")}/acquisition.json")
    val voxelOverride = manifest.flatMap(Manifest.voxelResolution)

    var totalBytes = 0L
    for (stack <- stacks) {
      val tileName = stack.split('/').last
      val originOverride = manifest.flatMap(m => Manifest.tileTranslationUm(m, tileName))
      val stats = ImarisToZarr.convert(
        spark, stack, a.output,
        ImarisToZarr.Settings(
          shard = a.shard, chunk = a.chunk, zstdLevel = a.zstdLevel,
          translatePyramid = a.translate, computeLevels = a.levels,
          downsampleMode = a.mode, scaleFactor = Shape3(2, 2, 2),
          voxelSizeOverrideUm = voxelOverride,
          originOverrideUm = originOverride))
      val bytes = stats.map(_.bytesWritten).sum
      totalBytes += bytes
      println(s"[ims-to-zarr] $tileName: ${stats.length} shards, $bytes bytes, " +
        s"levels ${stats.map(_.level).distinct.sorted.mkString(",")}")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    // reference job response: status 200 + wall-time message (O4)
    println(f"[ims-to-zarr] DONE ${stacks.length} stacks, $totalBytes bytes in $secs%.1fs")
    spark.stop()
  }
}
