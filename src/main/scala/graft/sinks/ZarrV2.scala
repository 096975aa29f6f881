package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration

import graft.core.Geometry.Shape3
import graft.core.Json
import graft.core.Json._

/** Zarr v2 store writer — the reference's legacy output path (W1,
  * `imaris_to_zarr_writer`, `compress/imaris_to_zarr.py:807-990`): 3-D
  * (Z,Y,X) uint16 LE arrays per pyramid level, one file per chunk
  * (`z.y.x` keys, "." separator), Blosc-compressed chunks
  * (default cname=zstd, clevel=3, byte shuffle — `:877-882`), group
  * metadata in `.zgroup` / `.zattrs`, per-level `.zarray`.
  *
  * Chunks are always FULL chunk-shape, fill-padded at the array edge
  * (zarr v2 semantics). A conversion task covers a shard-aligned region
  * and writes every chunk file inside it — same one-writer-per-key
  * coordination-free invariant as the v3 shard path (W4/X3), just with
  * finer-grained output files.
  */
object ZarrV2 {

  val Fill: Short = 0

  /** `.zarray` document for one level (numcodecs-style blosc config). */
  def arrayMetadata(
      shape: Seq[Long],
      chunks: Seq[Long],
      cname: String = "zstd",
      clevel: Int = 3,
      shuffle: Int = Blosc.SHUFFLE,
      separator: String = "."): JValue =
    obj(
      "zarr_format" -> num(2),
      "shape" -> arr(shape.map(num): _*),
      "chunks" -> arr(chunks.map(num): _*),
      "dtype" -> str("<u2"),
      "compressor" -> obj(
        "id" -> str("blosc"),
        "cname" -> str(cname),
        "clevel" -> num(clevel),
        "shuffle" -> num(shuffle),
        "blocksize" -> num(0)
      ),
      "fill_value" -> num(0),
      "order" -> str("C"),
      "filters" -> Json.JNull,
      "dimension_separator" -> str(separator)
    )

  /** `.zgroup` document. */
  def groupMetadata: JValue = obj("zarr_format" -> num(2))

  /** Chunk key within a level dir ("." = flat v2 default, "/" = nested). */
  def chunkKey(gz: Long, gy: Long, gx: Long, separator: String = "."): String =
    Seq(gz, gy, gx).mkString(separator)

  /** Write every chunk file of a shard-aligned region. `regionData` holds
    * the region voxels in C order (possibly in an oversized reused
    * buffer); `origin` is the region's global voxel origin (a multiple of
    * `chunk` by construction — shard % chunk == 0); `arrayShape` bounds
    * edge clipping. Returns bytes written.
    */
  def writeRegionChunks(
      fsConf: Configuration,
      levelDir: String,
      regionData: Array[Short],
      dataShape: Shape3,
      origin: Shape3,
      chunk: Shape3,
      cname: String = "zstd",
      clevel: Int = 3,
      shuffle: Int = Blosc.SHUFFLE,
      separator: String = "."): Long = {
    require(separator == "." || separator == "/",
      s"dimension_separator must be '.' or '/', got: $separator")
    require(regionData.length >= dataShape.voxels,
      s"region payload ${regionData.length} < ${dataShape.voxels}")
    require(origin.z % chunk.z == 0 && origin.y % chunk.y == 0 && origin.x % chunk.x == 0,
      s"region origin $origin not chunk-aligned to $chunk")
    val chunkVox = chunk.voxels.toInt
    val buf = ByteBuffer.allocate(chunkVox * 2).order(ByteOrder.LITTLE_ENDIAN)
    var written = 0L
    var z0 = 0L
    while (z0 < dataShape.z) {
      var y0 = 0L
      while (y0 < dataShape.y) {
        var x0 = 0L
        while (x0 < dataShape.x) {
          buf.clear()
          val zHi = math.min(chunk.z, dataShape.z - z0)
          val yHi = math.min(chunk.y, dataShape.y - y0)
          val xHi = math.min(chunk.x, dataShape.x - x0)
          var z = 0L
          while (z < chunk.z) {
            var y = 0L
            while (y < chunk.y) {
              var x = 0L
              if (z < zHi && y < yHi) {
                val srcBase = (((z0 + z) * dataShape.y + (y0 + y)) * dataShape.x + x0).toInt
                while (x < xHi) { buf.putShort(regionData(srcBase + x.toInt)); x += 1 }
              }
              while (x < chunk.x) { buf.putShort(Fill); x += 1 }
              y += 1
            }
            z += 1
          }
          val comp = Blosc.compress(buf.array(), typesize = 2, cname = cname,
            clevel = clevel, shuffle = shuffle)
          // "/" yields zarr-python's nested store layout (subdirectories);
          // the FS create makes parents, so both layouts share this path
          val key = chunkKey(
            (origin.z + z0) / chunk.z, (origin.y + y0) / chunk.y,
            (origin.x + x0) / chunk.x, separator)
          ZarrV3.write(fsConf, s"$levelDir/$key", comp)
          written += comp.length
          x0 += chunk.x
        }
        y0 += chunk.y
      }
      z0 += chunk.z
    }
    written
  }

  /** Read an arbitrary voxel region back from a v2 level directory (the
    * compute-pyramid source path, the v2→v3 migration, and the
    * round-trip tests). `separator` supports foreign stores written with
    * `dimension_separator: "/"` (zarr-python's nested store layout).
    */
  def readRegion(
      conf: Configuration,
      levelDir: String,
      shape: Shape3,
      chunk: Shape3,
      z0: Long, z1: Long, y0: Long, y1: Long, x0: Long, x1: Long,
      separator: String = ".",
      allowMissing: Boolean = false): Array[Short] =
    readRegionInto(conf, levelDir, shape, chunk, z0, z1, y0, y1, x0, x1,
      new Array[Short](((z1 - z0) * (y1 - y0) * (x1 - x0)).toInt), separator,
      allowMissing)

  /** [[readRegion]] into a caller-owned (possibly oversized, REUSED)
    * buffer. Returns `out`.
    *
    * `allowMissing` scopes the zarr v2 absent-chunk-is-fill_value
    * semantics to callers reading FOREIGN stores (zarr-python's
    * `write_empty_chunks=False` omits all-fill chunks — the ZarrMigrate
    * path). Our own writer always writes every chunk, so on internal
    * reads (the compute-pyramid source) a missing chunk is a lost write
    * or a path bug and must stay a loud FileNotFoundException — silently
    * zero-filling there would corrupt downsampled levels.
    */
  def readRegionInto(
      conf: Configuration,
      levelDir: String,
      shape: Shape3,
      chunk: Shape3,
      z0: Long, z1: Long, y0: Long, y1: Long, x0: Long, x1: Long,
      out: Array[Short],
      separator: String = ".",
      allowMissing: Boolean = false): Array[Short] = {
    val nz = (z1 - z0).toInt; val ny = (y1 - y0).toInt; val nx = (x1 - x0).toInt
    require(out.length >= nz.toLong * ny * nx,
      s"region buffer ${out.length} < ${nz.toLong * ny * nx}")
    var gz = z0 / chunk.z
    while (gz * chunk.z < z1) {
      var gy = y0 / chunk.y
      while (gy * chunk.y < y1) {
        var gx = x0 / chunk.x
        while (gx * chunk.x < x1) {
          val c0z = gz * chunk.z; val c0y = gy * chunk.y; val c0x = gx * chunk.x
          val key = Seq(gz, gy, gx).mkString(separator)
          val raw =
            try Blosc.decompress(ZarrV3.read(conf, s"$levelDir/$key"))
            catch {
              case _: java.io.FileNotFoundException if allowMissing => null
            }
          if (raw != null)
            require(raw.length == chunk.voxels * 2,
              s"chunk $key: ${raw.length} bytes, want ${chunk.voxels * 2}")
          val cb =
            if (raw == null) null
            else ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          val izLo = math.max(z0, c0z); val izHi = math.min(z1, math.min(c0z + chunk.z, shape.z))
          val iyLo = math.max(y0, c0y); val iyHi = math.min(y1, math.min(c0y + chunk.y, shape.y))
          val ixLo = math.max(x0, c0x); val ixHi = math.min(x1, math.min(c0x + chunk.x, shape.x))
          var z = izLo
          while (z < izHi) {
            var y = iyLo
            while (y < iyHi) {
              val srcBase = (((z - c0z) * chunk.y + (y - c0y)) * chunk.x + (ixLo - c0x)).toInt
              val dstBase = (((z - z0) * ny + (y - y0)) * nx + (ixLo - x0)).toInt
              var i = 0
              val run = (ixHi - ixLo).toInt
              if (cb == null) {
                // `out` is a reused buffer: the hole must be written, not skipped
                while (i < run) { out(dstBase + i) = Fill; i += 1 }
              } else {
                while (i < run) { out(dstBase + i) = cb.getShort(2 * (srcBase + i)); i += 1 }
              }
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
