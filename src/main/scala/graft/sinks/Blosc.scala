package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM Blosc(1) chunk codec (reference P8 + the W1 v2-writer
  * compressor: `Blosc(cname="zstd", clevel=3, shuffle=Blosc.SHUFFLE)`,
  * `compress/imaris_to_zarr.py:877-895`).
  *
  * Implements the public c-blosc1 chunk container format
  * (c-blosc `README_CHUNK_FORMAT.rst`):
  * {{{
  *   |-0-|-1-|-2-|-3-|-4.....7-|-8....11-|-12...15-|
  *     ^   ^   ^   ^   nbytes    blocksize  cbytes     (int32 LE each)
  *     |   |   |   +-- typesize
  *     |   |   +------ flags: bit0 byte-shuffle, bit1 memcpy,
  *     |   |                  bit2 bit-shuffle, bit4 dont-split,
  *     |   |                  bits5-7 compressor code
  *     |   +---------- versionlz (1)
  *     +-------------- version (2)
  *   then, unless memcpy: int32 LE bstarts[nblocks] (absolute offset of
  *   each block), then per block one or more streams, each
  *   [int32 LE clen][payload]; clen == uncompressed stream length marks a
  *   stored-raw stream.
  * }}}
  *
  * Backend codecs come from jars Spark already ships: zstd (zstd-jni),
  * lz4/lz4hc (lz4-java, raw block format), zlib (java.util.zip), snappy
  * (snappy-java, raw block format). blosclz (c-blosc's default cname, a
  * FastLZ-derived LZ77) is DECODE-ONLY: [[decompressBloscLz]] implements
  * the public stream format so foreign v2 stores written with the c-blosc
  * default decode; compressing with it is still rejected (the reference's
  * writer always uses zstd-in-blosc, `imaris_to_zarr.py:884-895`).
  *
  * Write-side choices (all format-legal, chosen for unambiguous decode):
  * the dont-split flag (bit 4, c-blosc >= 1.14) is always set, so every
  * block is exactly one stream; blocksize defaults to 256 KiB rounded to
  * a multiple of typesize. Read-side handles both split and non-split
  * chunks: a chunk without the dont-split bit uses the pre-1.14 universal
  * split rule (typesize <= 16, non-leftover block, >= 128 elements per
  * stream — independent of shuffle, matching real c-blosc). Byte-shuffle
  * matches c-blosc exactly; bit-shuffle is the bitshuffle bit-transpose
  * (plane k = bit k of each element, k ordered byte-major LSB-first,
  * planes packed LSB-first) — verified in the spec against hand-computed
  * goldens AND an independent reimplementation of the published scalar
  * algorithm (byte-transpose / TRANS_BIT_8X8 / bit-row regroup); a live
  * c-blosc binary cross-check remains impossible in this container.
  */
object Blosc {

  // numcodecs / c-blosc public shuffle constants
  val NOSHUFFLE = 0
  val SHUFFLE = 1
  val BITSHUFFLE = 2
  val AUTOSHUFFLE = -1

  /** P8 shuffle-name resolution (reference `_shuffle_map`,
    * `imaris_to_zarr.py:884-895`).
    */
  val ShuffleNames: Map[String, Int] = Map(
    "noshuffle" -> NOSHUFFLE,
    "shuffle" -> SHUFFLE,
    "bitshuffle" -> BITSHUFFLE,
    "autoshuffle" -> AUTOSHUFFLE)

  // compressor codes (flags bits 5-7)
  private val CodecCodes: Map[String, Int] = Map(
    "blosclz" -> 0, "lz4" -> 1, "lz4hc" -> 1, "snappy" -> 2,
    "zlib" -> 3, "zstd" -> 4)

  private val FlagByteShuffle = 0x01
  private val FlagMemcpy = 0x02
  private val FlagBitShuffle = 0x04
  private val FlagDontSplit = 0x10

  // c-blosc split rule constants (pre-1.14 chunks without the dont-split
  // bit split shuffled blocks into `typesize` streams under these bounds)
  private val MaxSplits = 16
  private val MinBufferSize = 128

  val HeaderLen = 16

  /** Compress one buffer into a self-describing blosc chunk. */
  def compress(
      raw: Array[Byte],
      typesize: Int,
      cname: String = "zstd",
      clevel: Int = 3,
      shuffle: Int = SHUFFLE,
      blocksize: Int = 0): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize out of range: $typesize")
    require(clevel >= 0 && clevel <= 9, s"clevel out of range: $clevel")
    require(raw.length <= Int.MaxValue - HeaderLen, "buffer too large for blosc1 chunk")
    val ccode = CodecCodes.getOrElse(cname,
      sys.error(s"unsupported blosc cname: $cname (lz4|lz4hc|snappy|zlib|zstd)"))
    require(cname != "blosclz", "blosclz has no JVM implementation; use zstd/lz4/zlib/snappy")
    val shuf = shuffle match {
      case AUTOSHUFFLE => if (typesize == 1) BITSHUFFLE else SHUFFLE
      case s => s
    }
    require(shuf == NOSHUFFLE || shuf == SHUFFLE || shuf == BITSHUFFLE,
      s"bad shuffle: $shuffle")
    val n = raw.length
    if (clevel == 0 || n == 0) return memcpyChunk(raw, typesize)

    val bsizeWant = if (blocksize > 0) blocksize else 256 * 1024
    val bsize0 = math.max(typesize, bsizeWant / typesize * typesize)
    val bsize = math.min(n, bsize0)
    val nblocks = (n + bsize - 1) / bsize

    val doByteShuffle = shuf == SHUFFLE && typesize > 1
    val doBitShuffle = shuf == BITSHUFFLE

    val scratch = new Array[Byte](bsize) // shuffled block staging
    val out = new java.io.ByteArrayOutputStream(n / 2 + 64)
    val bstarts = new Array[Int](nblocks)
    var pos = HeaderLen + 4 * nblocks

    var b = 0
    while (b < nblocks) {
      val off = b * bsize
      val len = math.min(bsize, n - off)
      val src =
        if (doByteShuffle) { shuffleBytes(typesize, raw, off, len, scratch); scratch }
        else if (doBitShuffle) { bitShuffle(typesize, raw, off, len, scratch); scratch }
        else raw
      val srcOff = if (doByteShuffle || doBitShuffle) 0 else off
      val comp = compressStream(src, srcOff, len, ccode, cname, clevel)
      bstarts(b) = pos
      val stream = new Array[Byte](4 + math.min(comp.length, len))
      val sb = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
      if (comp.length < len) { sb.putInt(comp.length); sb.put(comp) }
      else { sb.putInt(len); sb.put(src, srcOff, len) } // stored raw, clen == len marker
      out.write(stream, 0, stream.length)
      pos += stream.length
      b += 1
    }

    val cbytes = pos
    if (cbytes >= n + HeaderLen) return memcpyChunk(raw, typesize)

    val chunk = new Array[Byte](cbytes)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte) // version
    hb.put(1.toByte) // versionlz
    val flags = (if (doByteShuffle) FlagByteShuffle else 0) |
      (if (doBitShuffle) FlagBitShuffle else 0) | FlagDontSplit | (ccode << 5)
    hb.put(flags.toByte)
    hb.put(typesize.toByte)
    hb.putInt(n)
    hb.putInt(bsize)
    hb.putInt(cbytes)
    var i = 0
    while (i < nblocks) { hb.putInt(bstarts(i)); i += 1 }
    System.arraycopy(out.toByteArray, 0, chunk, HeaderLen + 4 * nblocks,
      cbytes - HeaderLen - 4 * nblocks)
    chunk
  }

  private def memcpyChunk(raw: Array[Byte], typesize: Int): Array[Byte] = {
    val chunk = new Array[Byte](HeaderLen + raw.length)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte); hb.put(FlagMemcpy.toByte)
    hb.put(typesize.toByte)
    hb.putInt(raw.length); hb.putInt(raw.length); hb.putInt(chunk.length)
    System.arraycopy(raw, 0, chunk, HeaderLen, raw.length)
    chunk
  }

  /** Decompress a blosc chunk (split or non-split layout). */
  def decompress(chunk: Array[Byte]): Array[Byte] = {
    require(chunk.length >= HeaderLen, s"blosc chunk too short: ${chunk.length}")
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    val version = hb.get(0) & 0xff
    require(version <= 2, s"unsupported blosc format version: $version")
    val flags = hb.get(2) & 0xff
    val typesize = math.max(1, hb.get(3) & 0xff)
    val nbytes = hb.getInt(4)
    val blocksize = hb.getInt(8)
    val cbytes = hb.getInt(12)
    require(nbytes >= 0 && cbytes == chunk.length,
      s"blosc header cbytes $cbytes != chunk length ${chunk.length}")
    val out = new Array[Byte](nbytes)
    if ((flags & FlagMemcpy) != 0) {
      require(chunk.length >= HeaderLen + nbytes, "truncated memcpy chunk")
      System.arraycopy(chunk, HeaderLen, out, 0, nbytes)
      return out
    }
    val ccode = (flags >> 5) & 0x7
    val doByteShuffle = (flags & FlagByteShuffle) != 0 && typesize > 1
    val doBitShuffle = (flags & FlagBitShuffle) != 0
    val dontSplit = (flags & FlagDontSplit) != 0
    require(blocksize > 0, s"bad blocksize: $blocksize")
    val nblocks = (nbytes + blocksize - 1) / blocksize
    // a foreign header may declare blocksize > nbytes (one partial
    // block); allocate only what a block can actually hold
    val block = new Array[Byte](math.max(1, math.min(blocksize, nbytes)))
    var b = 0
    while (b < nblocks) {
      val bstart = hb.getInt(HeaderLen + 4 * b)
      val off = b * blocksize
      val len = math.min(blocksize, nbytes - off)
      val leftover = len < blocksize
      // pre-1.14 split rule: full blocks split into `typesize` streams when
      // typesize and the per-stream size are in bounds — REGARDLESS of
      // shuffle (real c-blosc splits unshuffled blocks too; chunks that
      // don't split carry the dont-split bit from 1.14 on)
      val nstreams =
        if (dontSplit || leftover || typesize > MaxSplits ||
          len % typesize != 0 || len / typesize < MinBufferSize) 1
        else typesize
      val streamLen = len / nstreams
      var sOff = bstart
      var s = 0
      while (s < nstreams) {
        val clen = hb.getInt(sOff)
        sOff += 4
        if (clen == streamLen)
          System.arraycopy(chunk, sOff, block, s * streamLen, streamLen)
        else
          decompressStream(chunk, sOff, clen, block, s * streamLen, streamLen, ccode)
        sOff += clen
        s += 1
      }
      if (doByteShuffle) unshuffleBytes(typesize, block, len, out, off)
      else if (doBitShuffle) bitUnshuffle(typesize, block, len, out, off)
      else System.arraycopy(block, 0, out, off, len)
      b += 1
    }
    out
  }

  // ---- inner stream codecs ------------------------------------------------

  private def compressStream(
      src: Array[Byte], off: Int, len: Int,
      ccode: Int, cname: String, clevel: Int): Array[Byte] = ccode match {
    case 1 =>
      val f = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
      val c = if (cname == "lz4hc") f.highCompressor() else f.fastCompressor()
      val max = c.maxCompressedLength(len)
      val dst = new Array[Byte](max)
      val n = c.compress(src, off, len, dst, 0, max)
      java.util.Arrays.copyOf(dst, n)
    case 2 =>
      val dst = new Array[Byte](org.xerial.snappy.Snappy.maxCompressedLength(len))
      val n = org.xerial.snappy.Snappy.rawCompress(src, off, len, dst, 0)
      java.util.Arrays.copyOf(dst, n)
    case 3 =>
      val d = new java.util.zip.Deflater(zlibLevel(clevel))
      try {
        d.setInput(src, off, len); d.finish()
        val dst = new Array[Byte](len + len / 1000 + 64)
        var n = 0
        while (!d.finished && n < dst.length) n += d.deflate(dst, n, dst.length - n)
        if (d.finished) java.util.Arrays.copyOf(dst, n)
        else new Array[Byte](len + 1) // didn't fit => force stored-raw path
      } finally d.end()
    case 4 =>
      val dst = new Array[Byte](com.github.luben.zstd.Zstd.compressBound(len.toLong).toInt)
      val n = com.github.luben.zstd.Zstd.compressByteArray(
        dst, 0, dst.length, src, off, len, zstdLevel(clevel))
      java.util.Arrays.copyOf(dst, n.toInt)
    case other => sys.error(s"unsupported blosc compressor code: $other")
  }

  private def decompressStream(
      src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int, ccode: Int): Unit = ccode match {
    case 0 =>
      decompressBloscLz(src, srcOff, srcLen, dst, dstOff, dstLen)
    case 1 =>
      val d = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().safeDecompressor()
      val n = d.decompress(src, srcOff, srcLen, dst, dstOff, dstLen)
      require(n == dstLen, s"lz4 stream expanded to $n, want $dstLen")
    case 2 =>
      val n = org.xerial.snappy.Snappy.rawUncompress(src, srcOff, srcLen, dst, dstOff)
      require(n == dstLen, s"snappy stream expanded to $n, want $dstLen")
    case 3 =>
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(src, srcOff, srcLen)
        var n = 0
        while (!inf.finished && n < dstLen) {
          val k = inf.inflate(dst, dstOff + n, dstLen - n)
          require(k > 0 || inf.finished, "zlib stream stalled")
          n += k
        }
        require(n == dstLen, s"zlib stream expanded to $n, want $dstLen")
      } finally inf.end()
    case 4 =>
      val n = com.github.luben.zstd.Zstd.decompressByteArray(
        dst, dstOff, dstLen, src, srcOff, srcLen)
      require(n == dstLen, s"zstd stream expanded to $n, want $dstLen")
    case other => sys.error(s"unsupported blosc compressor code: $other")
  }

  /** blosclz stream decoder (c-blosc `blosclz.c`, a FastLZ-derived LZ77 —
    * public format). Instruction stream:
    *   - first control byte is masked to its low 5 bits (always starts
    *     with a literal run);
    *   - ctrl < 32: literal run of ctrl+1 bytes copied from the input;
    *   - ctrl >= 32: match of (ctrl>>5)-1 + 3 bytes; while the length
    *     field is saturated (ctrl>>5 == 7) extension bytes add to the
    *     length until one is != 255. Distance = ((ctrl&31)<<8) + code + 1
    *     where code is the next byte; code == 255 with ctrl&31 == 31
    *     switches to a far match: 16-bit big-endian offset + 8192.
    *   - matches may self-overlap (distance 1 == RLE of the prior byte),
    *     so the copy is byte-by-byte.
    * Decode-only: our write path never emits blosclz.
    */
  private[graft] def decompressBloscLz(
      src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    require(srcLen > 0 && srcOff.toLong + srcLen <= src.length,
      s"bad blosclz stream bounds: off=$srcOff len=$srcLen of ${src.length}")
    var ip = srcOff
    val ipEnd = srcOff + srcLen
    var op = dstOff
    val opEnd = dstOff + dstLen
    var ctrl = src(ip) & 31
    ip += 1
    var more = true
    while (more) {
      if (ctrl >= 32) {
        var len = (ctrl >> 5) - 1
        val ofs = (ctrl & 31) << 8
        if (len == 6) { // saturated: accumulate extension bytes
          var ext = 0
          do {
            require(ip < ipEnd, "truncated blosclz length extension")
            ext = src(ip) & 0xff; ip += 1; len += ext
          } while (ext == 255)
        }
        require(ip < ipEnd, "truncated blosclz match offset")
        val code = src(ip) & 0xff
        ip += 1
        var dist = ofs + code + 1
        if (code == 255 && ofs == (31 << 8)) { // far match, 16-bit offset
          require(ip + 1 < ipEnd, "truncated blosclz far offset")
          dist = ((src(ip) & 0xff) << 8) + (src(ip + 1) & 0xff) + 8192
          ip += 2
        }
        val n = len + 3
        val ref = op - dist
        require(ref >= dstOff, s"blosclz match before buffer: dist=$dist at ${op - dstOff}")
        require(op + n <= opEnd, s"blosclz match overruns output: $n at ${op - dstOff}")
        var i = 0
        while (i < n) { dst(op + i) = dst(ref + i); i += 1 } // overlap-safe
        op += n
      } else {
        val run = ctrl + 1
        require(ip + run <= ipEnd, "truncated blosclz literal run")
        require(op + run <= opEnd, s"blosclz literals overrun output at ${op - dstOff}")
        System.arraycopy(src, ip, dst, op, run)
        ip += run
        op += run
      }
      if (ip < ipEnd) { ctrl = src(ip) & 0xff; ip += 1 } else more = false
    }
    require(op == opEnd, s"blosclz stream expanded to ${op - dstOff}, want $dstLen")
  }

  /** blosc clevel (0-9) → zstd level 1-22 (c-blosc's zstd mapping is
    * roughly linear into zstd's range; clamp keeps any input legal).
    */
  private def zstdLevel(clevel: Int): Int = math.max(1, math.min(22, clevel * 2))
  private def zlibLevel(clevel: Int): Int = math.max(1, math.min(9, clevel))

  // ---- shuffles -------------------------------------------------------------

  /** c-blosc byte shuffle of one block: element bytes de-interleaved into
    * `typesize` planes; a trailing `len % typesize` remainder is copied
    * verbatim (mirrors c-blosc's `shuffle` leftover handling).
    */
  private[graft] def shuffleBytes(
      ts: Int, src: Array[Byte], srcOff: Int, len: Int, dst: Array[Byte]): Unit = {
    val nel = len / ts
    var j = 0
    while (j < ts) {
      var i = 0
      val base = j * nel
      while (i < nel) { dst(base + i) = src(srcOff + i * ts + j); i += 1 }
      j += 1
    }
    var r = nel * ts
    while (r < len) { dst(r) = src(srcOff + r); r += 1 }
  }

  private[graft] def unshuffleBytes(
      ts: Int, src: Array[Byte], len: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val nel = len / ts
    var j = 0
    while (j < ts) {
      var i = 0
      val base = j * nel
      while (i < nel) { dst(dstOff + i * ts + j) = src(base + i); i += 1 }
      j += 1
    }
    var r = nel * ts
    while (r < len) { dst(dstOff + r) = src(r); r += 1 }
  }

  /** Bit transpose (bitshuffle): view the multiple-of-(ts·8) prefix as an
    * (elements × ts·8 bits) matrix — bit k of an element lives in byte
    * k>>3 at in-byte position k&7 — and emit bit-plane k as element bits
    * packed LSB-first. The remainder is copied verbatim.
    */
  private[graft] def bitShuffle(
      ts: Int, src: Array[Byte], srcOff: Int, len: Int, dst: Array[Byte]): Unit = {
    val unit = ts * 8
    val main = len / unit * unit
    val nel = main / ts
    java.util.Arrays.fill(dst, 0, main, 0.toByte)
    if (nel > 0) {
      val planeBytes = nel / 8
      var k = 0
      while (k < unit) {
        val byteIdx = k >> 3; val bit = k & 7
        val planeBase = k * planeBytes
        var i = 0
        while (i < nel) {
          val v = (src(srcOff + i * ts + byteIdx) >> bit) & 1
          if (v != 0) dst(planeBase + (i >> 3)) = (dst(planeBase + (i >> 3)) | (1 << (i & 7))).toByte
          i += 1
        }
        k += 1
      }
    }
    var r = main
    while (r < len) { dst(r) = src(srcOff + r); r += 1 }
  }

  private[graft] def bitUnshuffle(
      ts: Int, src: Array[Byte], len: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val unit = ts * 8
    val main = len / unit * unit
    val nel = main / ts
    java.util.Arrays.fill(dst, dstOff, dstOff + main, 0.toByte)
    if (nel > 0) {
      val planeBytes = nel / 8
      var k = 0
      while (k < unit) {
        val byteIdx = k >> 3; val bit = k & 7
        val planeBase = k * planeBytes
        var i = 0
        while (i < nel) {
          val v = (src(planeBase + (i >> 3)) >> (i & 7)) & 1
          if (v != 0) {
            val d = dstOff + i * ts + byteIdx
            dst(d) = (dst(d) | (1 << bit)).toByte
          }
          i += 1
        }
        k += 1
      }
    }
    var r = main
    while (r < len) { dst(dstOff + r) = src(r); r += 1 }
  }
}
