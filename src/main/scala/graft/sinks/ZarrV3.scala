package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import com.github.luben.zstd.Zstd
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.Geometry.Shape3
import graft.core.Json
import graft.core.Json._

/** Zarr v3 sharded-store writer (reference W2: `create_scale_spec`,
  * `compress/imaris_to_zarr.py:141-269`).
  *
  * Byte-level format of one shard file (`sharding_indexed`,
  * index_location=end, index_codecs=[bytes LE, crc32c]):
  * {{{
  *   [chunk 0 bytes][chunk 1 bytes]...[index][crc32c(index) LE u32]
  *   index = per inner chunk, C-order over the shard's chunk grid:
  *           u64 LE offset, u64 LE nbytes;  missing chunk = (-1, -1)
  * }}}
  * Inner chunks are encoded with [transpose C (identity on our C-order
  * buffers), zstd(level)], always full chunk_shape (fill-padded at edges).
  *
  * One shard file is written whole by exactly one task — the reference's
  * coordination-free invariant (W4/X3, `imaris_to_zarr.py:1280-1283`)
  * which maps 1:1 onto Spark's one-output-file-per-task model.
  */
object ZarrV3 {

  /** uint16 fill value used for padding partial edge chunks. */
  val Fill: Short = 0

  // ---- shard encoding -----------------------------------------------------

  /** Encode one complete shard.
    *
    * @param shardData voxels of the shard region in C order (Z,Y,X),
    *                  sized exactly `dataShape.voxels`
    * @param dataShape the ACTUAL (possibly clipped at array edge) extent
    *                  of the data in this shard
    * @param shardShape the full logical shard shape (>= dataShape)
    * @param chunkShape inner chunk shape (divides shardShape)
    * @param level compression level
    * @param codec "zstd" (default, reference chain) or "gzip" (the other
    *              registered Zarr v3 compressor; stdlib-decodable, used
    *              by the external-interop cross-check)
    */
  def encodeShard(
      shardData: Array[Short],
      dataShape: Shape3,
      shardShape: Shape3,
      chunkShape: Shape3,
      level: Int = 3,
      codec: String = "zstd"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1 << 20)
    encodeShardTo(bos, shardData, dataShape, shardShape, chunkShape, level, codec)
    bos.toByteArray
  }

  /** Stream a shard directly to `path` (raw FS). Peak memory is one chunk
    * (staging + compressed), not the whole shard — a task encoding a
    * 512³ shard holds ~35 MB instead of ~500 MB, which keeps wide
    * executors (8–32 concurrent tasks) off the GC cliff and writes the
    * file in chunk-sized increments instead of one giant buffer.
    * Returns bytes written.
    */
  def writeShard(
      fsConf: Configuration,
      pathStr: String,
      shardData: Array[Short],
      dataShape: Shape3,
      shardShape: Shape3,
      chunkShape: Shape3,
      level: Int = 3,
      codec: String = "zstd"): Long = {
    val p = new Path(pathStr)
    val fs = rawFs(p, fsConf)
    val out = fs.create(p, true)
    try encodeShardTo(out, shardData, dataShape, shardShape, chunkShape, level, codec)
    finally out.close()
  }

  /** Core streaming encoder shared by [[encodeShard]] and [[writeShard]]:
    * chunks are staged in ONE reused buffer, compressed, and written as
    * produced; the (offset,nbytes) index + CRC32C trailer follows
    * (index_location=end). Returns total bytes written.
    */
  private def encodeShardTo(
      out: java.io.OutputStream,
      shardData: Array[Short],
      dataShape: Shape3,
      shardShape: Shape3,
      chunkShape: Shape3,
      level: Int,
      codec: String): Long = {
    // >= not ==: callers may pass a REUSED oversized region buffer (the
    // per-partition scratch in ImarisToZarr waves); indexing below is
    // purely coordinate-based over dataShape, so extra tail bytes are
    // never touched
    require(shardData.length >= dataShape.voxels,
      s"shard payload ${shardData.length} < ${dataShape.voxels}")
    require(shardShape.z % chunkShape.z == 0 && shardShape.y % chunkShape.y == 0
      && shardShape.x % chunkShape.x == 0, s"shard $shardShape not a multiple of chunk $chunkShape")
    val grid = Shape3(shardShape.z / chunkShape.z, shardShape.y / chunkShape.y,
      shardShape.x / chunkShape.x)
    val nChunks = grid.voxels.toInt
    val chunkVox = chunkShape.voxels.toInt
    val index = ByteBuffer.allocate(nChunks * 16 + 4).order(ByteOrder.LITTLE_ENDIAN)
    // ONE staging buffer reused across chunks; compressed chunks are
    // written as produced — peak state is O(chunk), never O(shard), and
    // shard files are no longer capped at a 2 GiB in-memory buffer
    val buf = ByteBuffer.allocate(chunkVox * 2).order(ByteOrder.LITTLE_ENDIAN)
    var off = 0L

    var cz = 0L
    while (cz < grid.z) {
      var cy = 0L
      while (cy < grid.y) {
        var cx = 0L
        while (cx < grid.x) {
          val z0 = cz * chunkShape.z; val y0 = cy * chunkShape.y; val x0 = cx * chunkShape.x
          if (z0 < dataShape.z && y0 < dataShape.y && x0 < dataShape.x) {
            // materialize the full-size chunk, fill-padded at data edge
            buf.clear()
            val zHi = math.min(chunkShape.z, dataShape.z - z0)
            val yHi = math.min(chunkShape.y, dataShape.y - y0)
            val xHi = math.min(chunkShape.x, dataShape.x - x0)
            var z = 0L
            while (z < chunkShape.z) {
              var y = 0L
              while (y < chunkShape.y) {
                var x = 0L
                if (z < zHi && y < yHi) {
                  val srcBase = (((z0 + z) * dataShape.y + (y0 + y)) * dataShape.x + x0).toInt
                  while (x < xHi) { buf.putShort(shardData(srcBase + x.toInt)); x += 1 }
                }
                while (x < chunkShape.x) { buf.putShort(Fill); x += 1 }
                y += 1
              }
              z += 1
            }
            val comp = compress(buf.array(), level, codec)
            out.write(comp)
            index.putLong(off); index.putLong(comp.length.toLong)
            off += comp.length
          } else {
            index.putLong(-1L); index.putLong(-1L)
          }
          cx += 1
        }
        cy += 1
      }
      cz += 1
    }

    val crc = new CRC32C()
    crc.update(index.array(), 0, nChunks * 16)
    index.putInt(crc.getValue.toInt)
    out.write(index.array())
    off + nChunks * 16 + 4
  }

  /** Decode one shard file back to (Z,Y,X) voxels of `dataShape` — the
    * round-trip reader used by tests and the translate path's cross-check.
    */
  def decodeShard(
      bytes: Array[Byte],
      dataShape: Shape3,
      shardShape: Shape3,
      chunkShape: Shape3): Array[Short] =
    decodeShardInto(bytes, dataShape, shardShape, chunkShape,
      new Array[Short](dataShape.voxels.toInt))

  /** [[decodeShard]] into a caller-owned (possibly oversized, REUSED)
    * buffer: the dataShape extent is explicitly reset to Fill first, so
    * elided all-fill chunks decode correctly even over stale bytes from
    * a previous shard. Returns `out`.
    */
  def decodeShardInto(
      bytes: Array[Byte],
      dataShape: Shape3,
      shardShape: Shape3,
      chunkShape: Shape3,
      out: Array[Short]): Array[Short] = {
    require(out.length >= dataShape.voxels,
      s"decode buffer ${out.length} < ${dataShape.voxels}")
    java.util.Arrays.fill(out, 0, dataShape.voxels.toInt, Fill)
    val grid = Shape3(shardShape.z / chunkShape.z, shardShape.y / chunkShape.y,
      shardShape.x / chunkShape.x)
    val nChunks = grid.voxels.toInt
    val indexLen = nChunks * 16
    val idxStart = bytes.length - indexLen - 4
    // NOTE: ByteBuffer.wrap(a, off, len) still indexes absolute gets from
    // a[0]; keep one whole-array buffer and offset explicitly.
    val whole = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def idxLong(i: Int): Long = whole.getLong(idxStart + i * 8)
    val crcStored = whole.getInt(idxStart + indexLen)
    val crc = new CRC32C()
    crc.update(bytes, idxStart, indexLen)
    require(crc.getValue.toInt == crcStored, "shard index CRC32C mismatch")

    val chunkVox = chunkShape.voxels.toInt
    // one decode buffer reused across chunks (same GC-wall avoidance as
    // the encode side; a 512³ shard otherwise churns ~500 MB per read)
    val raw = new Array[Byte](chunkVox * 2)
    var ci = 0
    var cz = 0L
    while (cz < grid.z) {
      var cy = 0L
      while (cy < grid.y) {
        var cx = 0L
        while (cx < grid.x) {
          val off = idxLong(ci * 2)
          val len = idxLong(ci * 2 + 1)
          if (off != -1L) {
            decompressInto(bytes, off.toInt, len.toInt, raw)
            val cb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
            val z0 = cz * chunkShape.z; val y0 = cy * chunkShape.y; val x0 = cx * chunkShape.x
            val zHi = math.min(chunkShape.z, dataShape.z - z0)
            val yHi = math.min(chunkShape.y, dataShape.y - y0)
            val xHi = math.min(chunkShape.x, dataShape.x - x0)
            var z = 0L
            while (z < zHi) {
              var y = 0L
              while (y < yHi) {
                val srcBase = ((z * chunkShape.y + y) * chunkShape.x).toInt
                val dstBase = (((z0 + z) * dataShape.y + (y0 + y)) * dataShape.x + x0).toInt
                var x = 0
                while (x < xHi) { out(dstBase + x) = cb.getShort(2 * (srcBase + x)); x += 1 }
                y += 1
              }
              z += 1
            }
          }
          ci += 1; cx += 1
        }
        cy += 1
      }
      cz += 1
    }
    out
  }

  // ---- codecs -------------------------------------------------------------

  private def compress(raw: Array[Byte], level: Int, codec: String): Array[Byte] = codec match {
    case "zstd" => Zstd.compress(raw, level)
    // blosc(zstd + byte shuffle): a REGISTERED zarr v3 codec, and on
    // uint16 voxel data the shuffle roughly HALVES the chunk bytes vs
    // plain zstd (measured 2.3 GB -> 1.2 GB on the 2.45 GB conversion
    // fixture) — at 100 TB that's the difference in stored bytes and
    // in write/read bandwidth
    case "blosc" => Blosc.compress(raw, typesize = 2, cname = "zstd",
      clevel = math.min(9, level), shuffle = Blosc.SHUFFLE)
    case "gzip" =>
      val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos) { `def`.setLevel(level) }
      gz.write(raw); gz.close()
      bos.toByteArray
    case other => sys.error(s"unsupported zarr codec: $other (zstd|blosc|gzip)")
  }

  /** Chunk decode into a caller-provided buffer (filled exactly), codec
    * detected by magic (blosc version bytes 02 01 / zstd 28 B5 2F FD /
    * gzip 1F 8B) so read paths need no codec plumbing.
    */
  private def decompressInto(src: Array[Byte], srcOff: Int, srcLen: Int, out: Array[Byte]): Unit =
    if (srcLen >= 2 && (src(srcOff) & 0xff) == 0x02 && (src(srcOff + 1) & 0xff) == 0x01) {
      val d = Blosc.decompress(java.util.Arrays.copyOfRange(src, srcOff, srcOff + srcLen))
      require(d.length == out.length, s"blosc chunk expanded to ${d.length}, want ${out.length}")
      System.arraycopy(d, 0, out, 0, d.length)
    } else if (srcLen >= 2 && (src(srcOff) & 0xff) == 0x1f && (src(srcOff + 1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(src, srcOff, srcLen))
      try {
        var off = 0
        var n = 0
        while (off < out.length && n >= 0) { n = in.read(out, off, out.length - off); if (n > 0) off += n }
        require(off == out.length, s"gzip chunk expanded to $off, want ${out.length}")
      } finally in.close()
    } else {
      val n = Zstd.decompressByteArray(out, 0, out.length, src, srcOff, srcLen)
      require(n == out.length, s"zstd chunk expanded to $n, want ${out.length}")
    }

  // ---- metadata -----------------------------------------------------------

  /** Array-level zarr.json for one pyramid level (5-D T,C,Z,Y,X with
    * T=C=1), mirroring the reference codec chain exactly
    * (`imaris_to_zarr.py:223-242`).
    */
  def arrayMetadata(
      shape5: Seq[Long],
      shard5: Seq[Long],
      chunk5: Seq[Long],
      zstdLevel: Int = 3,
      codecName: String = "zstd"): JValue =
    obj(
      "zarr_format" -> num(3),
      "node_type" -> str("array"),
      "shape" -> arr(shape5.map(num): _*),
      "data_type" -> str("uint16"),
      "chunk_grid" -> obj(
        "name" -> str("regular"),
        "configuration" -> obj("chunk_shape" -> arr(shard5.map(num): _*))
      ),
      "chunk_key_encoding" -> obj(
        "name" -> str("default"),
        "configuration" -> obj("separator" -> str("/"))
      ),
      "fill_value" -> num(0),
      "codecs" -> arr(
        obj(
          "name" -> str("sharding_indexed"),
          "configuration" -> obj(
            "chunk_shape" -> arr(chunk5.map(num): _*),
            "codecs" -> arr(
              obj("name" -> str("transpose"),
                "configuration" -> obj("order" -> arr((0 until 5).map(i => num(i)): _*))),
              obj("name" -> str("bytes"),
                "configuration" -> obj("endian" -> str("little"))),
              if (codecName == "gzip")
                obj("name" -> str("gzip"),
                  "configuration" -> obj("level" -> num(zstdLevel)))
              else if (codecName == "blosc")
                // registered zarr v3 blosc codec (zarr-specs codecs/blosc);
                // shuffle is spelled as a string in v3 configs
                obj("name" -> str("blosc"),
                  "configuration" -> obj(
                    "cname" -> str("zstd"),
                    "clevel" -> num(math.min(9, zstdLevel)),
                    "shuffle" -> str("shuffle"),
                    "typesize" -> num(2),
                    "blocksize" -> num(0)))
              else
                obj("name" -> str("zstd"),
                  "configuration" -> obj("level" -> num(zstdLevel), "checksum" -> bool(false)))
            ),
            "index_codecs" -> arr(
              obj("name" -> str("bytes"),
                "configuration" -> obj("endian" -> str("little"))),
              obj("name" -> str("crc32c"))
            ),
            "index_location" -> str("end")
          )
        )
      )
    )

  // ---- filesystem ---------------------------------------------------------

  /** Shard key within a level dir: `c/<t>/<c>/<z>/<y>/<x>` (default
    * chunk_key_encoding, "/" separator).
    */
  def shardKey(sz: Long, sy: Long, sx: Long): String = s"c/0/0/$sz/$sy/$sx"

  /** File system for shard I/O. On local disks Hadoop's default
    * `LocalFileSystem` is a ChecksumFileSystem: every write is split into
    * 512-byte CRC chunks (FSOutputSummer), turning one 250 MB shard write
    * into ~500k tiny write() syscalls — catastrophic under syscall-taxed
    * sandboxes (measured 100x slowdown) and pure overhead anywhere, since
    * Zarr v3 shards already carry a CRC32C index. Use the RAW local FS:
    * one large write() per shard. Non-local filesystems (s3a, hdfs) pass
    * through unchanged.
    */
  def rawFs(p: Path, conf: Configuration): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(conf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
      case other => other
    }

  def write(fsConf: Configuration, pathStr: String, bytes: Array[Byte]): Unit =
    write(fsConf, pathStr, bytes, bytes.length)

  /** Write the first `len` bytes of a (possibly oversized, reused) buffer. */
  def write(fsConf: Configuration, pathStr: String, bytes: Array[Byte], len: Int): Unit = {
    val p = new Path(pathStr)
    val fs = rawFs(p, fsConf)
    val out = fs.create(p, true)
    try out.write(bytes, 0, len)
    finally out.close()
  }

  def writeString(fsConf: Configuration, pathStr: String, s: String): Unit =
    write(fsConf, pathStr, s.getBytes("UTF-8"))

  def read(fsConf: Configuration, pathStr: String): Array[Byte] = {
    val p = new Path(pathStr)
    val fs = rawFs(p, fsConf)
    val st = fs.getFileStatus(p)
    require(st.getLen <= Int.MaxValue, s"$pathStr: ${st.getLen} bytes (> 2 GiB) — not readable into one buffer")
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf)
    finally in.close()
    buf
  }
}
