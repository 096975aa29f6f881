package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry.Shape3
import graft.plans.JobSettings

/** Settings schema (reference `models.py:20-143`): three entry modes,
  * field validation, reference-config compatibility.
  */
class JobSettingsSpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()

  test("JSON entry: full document round-trips") {
    val s = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out",
        |"s3_location":"s3://bkt/x","shard_size":[256,256,256],
        |"chunk_size":[64,128,128],"scale_factor":[1,2,2],
        |"downsample_levels":3,"downsample_mode":"median",
        |"translate_imaris_pyramid":false,"partition_mode":"file",
        |"single_tile_upload":true,"zstd_level":5}""".stripMargin)
    assert(s == JobSettings("/in", "/out", Some("s3://bkt/x"),
      Shape3(256, 256, 256), Shape3(64, 128, 128), Shape3(1, 2, 2),
      3, "median", translateImarisPyramid = false, "file",
      singleTileUpload = true, 5))
  }

  test("JSON entry: defaults match the reference schema") {
    val s = JobSettings.fromJson("""{"input_source":"/in","output_directory":"/out"}""")
    assert(s.shardSize == Shape3(512, 512, 512))
    assert(s.chunkSize == Shape3(128, 256, 256))
    assert(s.scaleFactor == Shape3(2, 2, 2))
    assert(s.downsampleLevels == 5 && s.downsampleMode == "mean")
    assert(s.translateImarisPyramid && s.partitionMode == "shard")
    assert(!s.singleTileUpload && s.zstdLevel == 3 && s.s3Location.isEmpty)
  }

  test("JSON entry: validation errors") {
    def bad(json: String, msgPart: String): Unit = {
      val e = intercept[Exception](JobSettings.fromJson(json))
      assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
    }
    bad("""{"output_directory":"/out"}""", "input_source is required")
    bad("""{"input_source":"/in"}""", "output_directory is required")
    bad("""{"input_source":"/in","output_directory":"/out","downsample_mode":"avg"}""",
      "downsample_mode must be one of")
    bad("""{"input_source":"/in","output_directory":"/out","partition_mode":"tile"}""",
      "partition_mode must be file|shard")
    bad("""{"input_source":"/in","output_directory":"/out","shard_size":[1,2]}""",
      "3-element array")
    bad("""{"input_source":"/in","output_directory":"/out","shard_size":[0,1,1]}""",
      "three positive integers")
    bad("""{"input_source":"/in","output_directory":"/out","downsample_levels":0}""",
      "downsample_levels must be >= 1")
    bad("""{"input_source":"/in","output_directory":"/out","zstd_level":40}""",
      "zstd level must be in [1,22]")
    bad("""{"input_source":"/in","output_directory":"/out","shard_syze":[1,1,1]}""",
      "unknown job-settings key")
    bad("""[1,2,3]""", "JSON object")
  }

  test("reference scheduler/compressor keys are accepted; clevel honored") {
    val s = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out",
        |"num_of_partitions":8,"partition_to_process":3,"dask_workers":4,
        |"use_tensorstore":true,"tensorstore_batch_size":2,
        |"compress_job_save_kwargs":{"n_jobs":-1},
        |"compressor_name":"blosc",
        |"compressor_kwargs":{"cname":"zstd","clevel":7,"shuffle":"shuffle"}}""".stripMargin)
    assert(s.zstdLevel == 7) // compressor_kwargs.clevel flows through
    assert(s.zarrFormat == 3) // use_tensorstore=true → sharded v3
    assert(s.bloscCname == "zstd" && s.bloscShuffle == "shuffle")
  }

  test("dimension_separator reaches v2Separator from JSON and is validated") {
    val s = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":2,
        |"dimension_separator":"/"}""".stripMargin)
    assert(s.v2Separator == "/")
    assert(JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out"}""").v2Separator == ".")
    intercept[Exception](JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":2,
        |"dimension_separator":"x"}""".stripMargin))
    val e = JobSettings.fromEnv(Map(
      "GRAFT_JOB_INPUT_SOURCE" -> "/in", "GRAFT_JOB_OUTPUT_DIRECTORY" -> "/out",
      "GRAFT_JOB_ZARR_FORMAT" -> "2", "GRAFT_JOB_DIMENSION_SEPARATOR" -> "/"))
    assert(e.v2Separator == "/")
  }

  test("use_tensorstore=false selects the legacy Zarr v2 writer (W1)") {
    val s = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out",
        |"use_tensorstore":false,
        |"compressor_kwargs":{"cname":"lz4","clevel":5,"shuffle":"bitshuffle"}}""".stripMargin)
    assert(s.zarrFormat == 2)
    assert(s.bloscCname == "lz4" && s.bloscShuffle == "bitshuffle" && s.zstdLevel == 5)
    // explicit zarr_format wins over use_tensorstore
    val s2 = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out",
        |"use_tensorstore":false,"zarr_format":3}""".stripMargin)
    assert(s2.zarrFormat == 3)
    // numcodecs int shuffle constants are accepted (P8 name map, both ways)
    val s3 = JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":2,
        |"compressor_kwargs":{"shuffle":2}}""".stripMargin)
    assert(s3.bloscShuffle == "bitshuffle")
    // v2 path validates blosc bounds: clevel <= 9, known cname/shuffle
    intercept[Exception](JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":2,"zstd_level":15}"""))
    intercept[Exception](JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":2,
        |"compressor_kwargs":{"cname":"blosclz"}}""".stripMargin))
    intercept[Exception](JobSettings.fromJson(
      """{"input_source":"/in","output_directory":"/out","zarr_format":4}"""))
  }

  test("config-file entry reads the same schema from a path") {
    val f = java.nio.file.Files.createTempFile("jobsettings", ".json")
    java.nio.file.Files.writeString(f,
      """{"input_source":"/in","output_directory":"/out","downsample_mode":"max"}""")
    val s = JobSettings.fromConfigFile(conf, f.toString)
    assert(s.downsampleMode == "max")
    intercept[Exception](JobSettings.fromConfigFile(conf, "/no/such/file.json"))
  }

  test("env entry: GRAFT_JOB_* variables") {
    val s = JobSettings.fromEnv(Map(
      "GRAFT_JOB_INPUT_SOURCE" -> "/in",
      "GRAFT_JOB_OUTPUT_DIRECTORY" -> "/out",
      "GRAFT_JOB_SHARD_SIZE" -> "64, 64, 64",
      "GRAFT_JOB_PARTITION_MODE" -> "file",
      "GRAFT_JOB_TRANSLATE_IMARIS_PYRAMID" -> "false"))
    assert(s.shardSize == Shape3(64, 64, 64))
    assert(s.partitionMode == "file" && !s.translateImarisPyramid)
    intercept[Exception](JobSettings.fromEnv(Map("GRAFT_JOB_INPUT_SOURCE" -> "/in")))
  }
}
