package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry.Shape3
import graft.plans.ImarisToZarr
import graft.sinks.{Blosc, ZarrV2, ZarrV3}

/** Zarr v2 legacy store (W1): chunk-grid round-trips with edge clipping,
  * `.zarray`/`.zgroup` metadata goldens, and the e2e conversion path
  * (`zarrFormat = 2`) — the reference's `use_tensorstore=False` default
  * writer (`imaris_to_zarr_writer`, `imaris_to_zarr.py:807-990`).
  */
class ZarrV2Spec extends AnyFunSuite with BeforeAndAfterAll {
  import Fixtures.v

  private var spark: SparkSession = _
  private lazy val conf = spark.sparkContext.hadoopConfiguration

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(".zarray metadata golden (numcodecs blosc config)") {
    val json = ZarrV2.arrayMetadata(Seq(40L, 30L, 20L), Seq(16L, 16L, 16L)).render
    assert(json ==
      """{"zarr_format":2,"shape":[40,30,20],"chunks":[16,16,16],"dtype":"<u2",""" +
      """"compressor":{"id":"blosc","cname":"zstd","clevel":3,"shuffle":1,"blocksize":0},""" +
      """"fill_value":0,"order":"C","filters":null,"dimension_separator":"."}""")
    assert(ZarrV2.groupMetadata.render == """{"zarr_format":2}""")
  }

  test("region write + read round-trip with edge-clipped chunks") {
    val shape = Shape3(40, 30, 20)
    val chunk = Shape3(16, 16, 16)
    val data = Array.tabulate(shape.voxels.toInt)(i => (i % 60000).toShort)
    val dir = Files.createTempDirectory("zarrv2").toString
    val written = ZarrV2.writeRegionChunks(
      conf, dir, data, shape, Shape3(0, 0, 0), chunk)
    assert(written > 0)
    // 3x2x2 chunk grid, every file present
    for (gz <- 0 until 3; gy <- 0 until 2; gx <- 0 until 2)
      assert(new java.io.File(s"$dir/$gz.$gy.$gx").exists, s"chunk $gz.$gy.$gx")
    val back = ZarrV2.readRegion(conf, dir, shape, chunk, 0, 40, 0, 30, 0, 20)
    assert(back.sameElements(data))
    // interior sub-region crossing chunk boundaries
    val sub = ZarrV2.readRegion(conf, dir, shape, chunk, 10, 35, 5, 25, 3, 18)
    for (z <- 10 until 35; y <- 5 until 25; x <- 3 until 18)
      assert(sub(((z - 10) * 20 + (y - 5)) * 15 + (x - 3)) ==
        data((z * 30 + y) * 20 + x))
  }

  test("edge chunks are full-size and fill-padded (v2 semantics)") {
    val shape = Shape3(20, 20, 20)
    val chunk = Shape3(16, 16, 16)
    val data = Array.fill(shape.voxels.toInt)(7.toShort)
    val dir = Files.createTempDirectory("zarrv2pad").toString
    ZarrV2.writeRegionChunks(conf, dir, data, shape, Shape3(0, 0, 0), chunk)
    val raw = Blosc.decompress(ZarrV3.read(conf, s"$dir/1.1.1"))
    assert(raw.length == chunk.voxels * 2, "edge chunk must be full chunk shape")
    val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // (0,0,0) of the edge chunk = voxel (16,16,16) -> 7; (4,0,0)-onward is fill
    assert(bb.getShort(0) == 7)
    assert(bb.getShort(2 * ((4 * 16 + 0) * 16 + 0)) == ZarrV2.Fill)
  }

  test("missing chunk files read as fill_value (write_empty_chunks=False interop)") {
    val shape = Shape3(40, 30, 20)
    val chunk = Shape3(16, 16, 16)
    val data = Array.tabulate(shape.voxels.toInt)(i => (i % 60000 + 1).toShort)
    val dir = Files.createTempDirectory("zarrv2hole").toString
    ZarrV2.writeRegionChunks(conf, dir, data, shape, Shape3(0, 0, 0), chunk)
    // zarr-python (write_empty_chunks=False default) omits all-fill chunks;
    // simulate a store with holes by deleting two chunk objects
    assert(new java.io.File(s"$dir/1.0.1").delete())
    assert(new java.io.File(s"$dir/2.1.0").delete())
    val back = ZarrV2.readRegion(conf, dir, shape, chunk, 0, 40, 0, 30, 0, 20,
      allowMissing = true)
    for (z <- 0 until 40; y <- 0 until 30; x <- 0 until 20) {
      val inHole = (z / 16 == 1 && y / 16 == 0 && x / 16 == 1) ||
        (z / 16 == 2 && y / 16 == 1 && x / 16 == 0)
      val want = if (inHole) ZarrV2.Fill else data((z * 30 + y) * 20 + x)
      assert(back((z * 30 + y) * 20 + x) == want, s"($z,$y,$x)")
    }
    // the reused-buffer path must overwrite stale contents in the hole
    val stale = Array.fill(shape.voxels.toInt)(12345.toShort)
    val back2 = ZarrV2.readRegionInto(
      conf, dir, shape, chunk, 16, 32, 0, 16, 16, 20, stale,
      allowMissing = true)
    for (z <- 16 until 32; y <- 0 until 16; x <- 16 until 20)
      assert(back2(((z - 16) * 16 + y) * 4 + (x - 16)) == ZarrV2.Fill, s"($z,$y,$x)")
    // INTERNAL reads (our writer always writes every chunk) must stay
    // loud: a hole there is a lost write, not v2 fill semantics
    intercept[java.io.FileNotFoundException](
      ZarrV2.readRegion(conf, dir, shape, chunk, 0, 40, 0, 30, 0, 20))
  }

  test("regions written shard-by-shard compose one consistent array") {
    val shape = Shape3(40, 32, 32)
    val chunk = Shape3(16, 16, 16)
    val shard = Shape3(32, 32, 32)
    val data = Array.tabulate(shape.voxels.toInt)(i => ((i * 31) % 60000).toShort)
    val dir = Files.createTempDirectory("zarrv2sh").toString
    // two shard-aligned regions along Z: [0,32) and [32,40)
    for (z0 <- Seq(0L, 32L)) {
      val z1 = math.min(z0 + shard.z, shape.z)
      val dz = (z1 - z0).toInt
      val region = new Array[Short](dz * 32 * 32)
      System.arraycopy(data, (z0 * 32 * 32).toInt, region, 0, region.length)
      ZarrV2.writeRegionChunks(conf, dir, region, Shape3(z1 - z0, 32, 32),
        Shape3(z0, 0, 0), chunk)
    }
    val back = ZarrV2.readRegion(conf, dir, shape, chunk, 0, 40, 0, 32, 0, 32)
    assert(back.sameElements(data))
  }

  test("v2 → v3 migration: pooled shard job, voxel-exact, attrs preserved") {
    val out = Files.createTempDirectory("zarrv2mig").toString
    ImarisToZarr.convert(
      spark, s"${Fixtures.dir}/ims_64.ims", out,
      ImarisToZarr.Settings(
        shard = Shape3(32, 32, 32), chunk = Shape3(16, 16, 16),
        translatePyramid = false, computeLevels = 2, zarrFormat = 2))
    val src = s"$out/ims_64.ome.zarr"
    val dst = Files.createTempDirectory("zarrv3mig").toString + "/ims_64.ome.zarr"
    val stats = graft.plans.ZarrMigrate.v2ToV3(
      spark, src, dst, shard = Shape3(32, 32, 32))
    assert(stats.map(_.voxels).sum == 64L * 64 * 64 + 32L * 32 * 32)
    // v3 root carries the v2 store's OME attributes verbatim
    val root = new String(ZarrV3.read(conf, s"$dst/zarr.json"), "UTF-8")
    assert(root.contains(""""zarr_format":3""") && root.contains("multiscales"))
    // both levels voxel-exact vs the v2 source
    for ((l, n) <- Seq((0, 64), (1, 32))) {
      val sh = Shape3(n, n, n)
      val got = graft.plans.ZarrRegion.read(conf, s"$dst/$l",
        sh, Shape3(32, 32, 32), Shape3(16, 16, 16), 0, n, 0, n, 0, n)
      val want = ZarrV2.readRegion(conf, s"$src/$l",
        sh, Shape3(16, 16, 16), 0, n, 0, n, 0, n)
      assert(got.sameElements(want), s"level $l")
    }
  }

  test("foreign blosclz v2 store lifts to v3 end-to-end (decode-only blosclz)") {
    // hand-built store in the shape real pre-1.14 c-blosc + zarr-python
    // write with the DEFAULT cname: split byte-shuffled blosclz chunks
    def rleStream(b: Byte, n: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x00); out.write(b & 0xff) // literal run of 1
      val len = n - 4 // match of len+3 = n-1 bytes at distance 1
      if (len < 6) out.write(((len + 1) << 5))
      else {
        out.write(0xE0)
        var rem = len - 6
        while (rem >= 255) { out.write(255); rem -= 255 }
        out.write(rem)
      }
      out.write(0x00) // offset code: distance 1
      out.toByteArray
    }
    val src = Files.createTempDirectory("zarrv2lz").toString
    ZarrV3.writeString(conf, s"$src/.zgroup", """{"zarr_format":2}""")
    ZarrV3.writeString(conf, s"$src/.zattrs", """{"ome":{"version":"0.5"}}""")
    ZarrV3.writeString(conf, s"$src/0/.zarray",
      ZarrV2.arrayMetadata(Seq(16L, 16L, 16L), Seq(8L, 8L, 8L), cname = "blosclz").render)
    val chunkVox = 512 // 8^3
    for (gz <- 0 until 2; gy <- 0 until 2; gx <- 0 until 2) {
      val idx = gz * 4 + gy * 2 + gx
      val lo = (idx + 1).toByte
      val hi = (idx + 0x11).toByte
      val streams = Seq(rleStream(lo, chunkVox), rleStream(hi, chunkVox))
      val bodyLen = streams.map(4 + _.length).sum
      val chunk = new Array[Byte](16 + 4 + bodyLen)
      val hb = java.nio.ByteBuffer.wrap(chunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hb.put(2.toByte); hb.put(1.toByte)
      hb.put(0x01.toByte) // byte-shuffle, NO dont-split, compressor 0 = blosclz
      hb.put(2.toByte)    // typesize
      hb.putInt(chunkVox * 2); hb.putInt(chunkVox * 2); hb.putInt(chunk.length)
      hb.putInt(20)
      for (s <- streams) { hb.putInt(s.length); hb.put(s) }
      ZarrV3.write(conf, s"$src/0/$gz.$gy.$gx", chunk)
    }
    def want(z: Int, y: Int, x: Int): Short = {
      val idx = (z / 8) * 4 + (y / 8) * 2 + (x / 8)
      (((idx + 0x11) << 8) | (idx + 1)).toShort
    }
    // direct v2 read decodes the blosclz chunks
    val direct = ZarrV2.readRegion(conf, s"$src/0",
      Shape3(16, 16, 16), Shape3(8, 8, 8), 0, 16, 0, 16, 0, 16)
    for (z <- 0 until 16; y <- 0 until 16; x <- 0 until 16)
      assert(direct((z * 16 + y) * 16 + x) == want(z, y, x), s"direct($z,$y,$x)")
    // full migration job lifts the store
    val dst = Files.createTempDirectory("zarrv3lz").toString + "/store.zarr"
    val stats = graft.plans.ZarrMigrate.v2ToV3(
      spark, src, dst, shard = Shape3(16, 16, 16))
    assert(stats.map(_.voxels).sum == 16L * 16 * 16)
    val got = graft.plans.ZarrRegion.read(conf, s"$dst/0",
      Shape3(16, 16, 16), Shape3(16, 16, 16), Shape3(8, 8, 8), 0, 16, 0, 16, 0, 16)
    for (z <- 0 until 16; y <- 0 until 16; x <- 0 until 16)
      assert(got((z * 16 + y) * 16 + x) == want(z, y, x), s"migrated($z,$y,$x)")
  }

  test("nested dimension_separator '/' writes, reads back, and migrates") {
    val out = Files.createTempDirectory("zarrv2nest").toString
    ImarisToZarr.convert(
      spark, s"${Fixtures.dir}/ims_64.ims", out,
      ImarisToZarr.Settings(
        shard = Shape3(32, 32, 32), chunk = Shape3(16, 16, 16),
        translatePyramid = false, computeLevels = 2, zarrFormat = 2,
        v2Separator = "/"))
    val store = s"$out/ims_64.ome.zarr"
    // zarr-python nested store layout: chunk keys are subdirectory paths
    assert(new java.io.File(s"$store/0/0/0/0").isFile)
    assert(new java.io.File(s"$store/0/1/1/1").isFile)
    assert(!new java.io.File(s"$store/0/0.0.0").exists)
    val zarray = new String(ZarrV3.read(conf, s"$store/0/.zarray"), "UTF-8")
    assert(zarray.contains(""""dimension_separator":"/""""))
    // read back through the separator-aware region reader, voxel-exact
    val l0 = ZarrV2.readRegion(conf, s"$store/0",
      Shape3(64, 64, 64), Shape3(16, 16, 16), 0, 64, 0, 64, 0, 64, "/")
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      assert(l0((z * 64 + y) * 64 + x) == v(z, y, x), s"($z,$y,$x)")
    // migration auto-detects the separator from .zarray
    val dst = Files.createTempDirectory("zarrv3nest").toString + "/store.zarr"
    val stats = graft.plans.ZarrMigrate.v2ToV3(
      spark, store, dst, shard = Shape3(32, 32, 32))
    assert(stats.map(_.voxels).sum == 64L * 64 * 64 + 32L * 32 * 32)
    val got = graft.plans.ZarrRegion.read(conf, s"$dst/0",
      Shape3(64, 64, 64), Shape3(32, 32, 32), Shape3(16, 16, 16),
      0, 64, 0, 64, 0, 64)
    assert(got.sameElements(l0))
  }

  test("migration unwraps the reference's v3-shaped .zattrs quirk") {
    // the reference's v2 path dumps a full v3 group dict into .zattrs;
    // migration must unwrap it so both flavors yield the same v3 nesting
    val src = Files.createTempDirectory("zarrv2quirk").toString
    ZarrV3.writeString(conf, s"$src/.zgroup", """{"zarr_format":2}""")
    ZarrV3.writeString(conf, s"$src/.zattrs",
      """{"zarr_format":3,"node_type":"group","attributes":{"ome":{"version":"0.5"}}}""")
    ZarrV3.writeString(conf, s"$src/0/.zarray",
      ZarrV2.arrayMetadata(Seq(8L, 8L, 8L), Seq(8L, 8L, 8L)).render)
    val data = Array.fill(512)(9.toShort)
    ZarrV2.writeRegionChunks(conf, s"$src/0", data, Shape3(8, 8, 8),
      Shape3(0, 0, 0), Shape3(8, 8, 8))
    val dst = Files.createTempDirectory("zarrv3quirk").toString + "/store.zarr"
    graft.plans.ZarrMigrate.v2ToV3(spark, src, dst, shard = Shape3(8, 8, 8))
    val root = new String(ZarrV3.read(conf, s"$dst/zarr.json"), "UTF-8")
    assert(root ==
      """{"zarr_format":3,"node_type":"group","attributes":{"ome":{"version":"0.5"}}}""")
  }

  test("e2e: ims_64 → Zarr v2 store with computed pyramid, voxel-exact") {
    val out = Files.createTempDirectory("zarrv2e2e").toString
    val stats = ImarisToZarr.convert(
      spark, s"${Fixtures.dir}/ims_64.ims", out,
      ImarisToZarr.Settings(
        shard = Shape3(32, 32, 32), chunk = Shape3(16, 16, 16),
        translatePyramid = false, computeLevels = 2,
        zarrFormat = 2))
    val store = s"$out/ims_64.ome.zarr"
    assert(stats.map(_.voxels).sum == 64L * 64 * 64 + 32L * 32 * 32)
    // v2 store layout: .zgroup, .zattrs, per-level .zarray, dotted chunk keys
    val zgroup = new String(ZarrV3.read(conf, s"$store/.zgroup"), "UTF-8")
    assert(zgroup == """{"zarr_format":2}""")
    val zattrs = new String(ZarrV3.read(conf, s"$store/.zattrs"), "UTF-8")
    assert(zattrs.contains(""""version":"0.5"""") && zattrs.contains("multiscales"))
    val zarray = new String(ZarrV3.read(conf, s"$store/0/.zarray"), "UTF-8")
    assert(zarray.contains(""""shape":[64,64,64]"""))
    assert(zarray.contains(""""id":"blosc""""))
    assert(new java.io.File(s"$store/0/0.0.0").exists)
    assert(!new java.io.File(s"$store/0/zarr.json").exists, "no v3 metadata in a v2 store")
    // level 0 voxel-exact vs the fixture's generator
    val l0 = ZarrV2.readRegion(conf, s"$store/0",
      Shape3(64, 64, 64), Shape3(16, 16, 16), 0, 64, 0, 64, 0, 64)
    for (z <- 0 until 64; y <- 0 until 64; x <- 0 until 64)
      assert(l0((z * 64 + y) * 64 + x) == v(z, y, x))
    // level 1 = mean-downsample of level 0 (2x2x2 windows)
    val l1 = ZarrV2.readRegion(conf, s"$store/1",
      Shape3(32, 32, 32), Shape3(16, 16, 16), 0, 32, 0, 32, 0, 32)
    for (z <- 0 until 32; y <- 0 until 32; x <- 0 until 32) {
      var s = 0L
      for (dz <- 0 until 2; dy <- 0 until 2; dx <- 0 until 2)
        s += (v(2 * z + dz, 2 * y + dy, 2 * x + dx) & 0xffff)
      assert(l1((z * 32 + y) * 32 + x) == (s / 8).toShort, s"l1($z,$y,$x)")
    }
  }
}
