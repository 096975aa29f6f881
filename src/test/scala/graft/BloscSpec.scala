package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Blosc

/** Blosc(1) chunk codec (P8 + the W1 v2-writer compressor): round-trips
  * across codecs/shuffles/typesizes/sizes, byte-level header format
  * assertions against the public c-blosc chunk layout, and a decode of a
  * hand-constructed pre-1.14 SPLIT chunk (the layout real c-blosc writes
  * for shuffled blosclz/lz4 blocks) built stream-by-stream per the spec.
  */
class BloscSpec extends AnyFunSuite {

  private def gradient(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i / 7) % 251).toByte)

  private def pseudoRandom(n: Int, seed: Long = 42L): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  test("round-trip grid: codecs x shuffles x typesizes x sizes") {
    val codecs = Seq("zstd", "lz4", "lz4hc", "zlib", "snappy")
    val shuffles = Seq(Blosc.NOSHUFFLE, Blosc.SHUFFLE, Blosc.BITSHUFFLE, Blosc.AUTOSHUFFLE)
    val typesizes = Seq(1, 2, 4, 8)
    val sizes = Seq(0, 1, 3, 17, 4096, 100001)
    for (c <- codecs; sh <- shuffles; ts <- typesizes; n <- sizes) {
      val data = gradient(n)
      val chunk = Blosc.compress(data, ts, c, clevel = 3, shuffle = sh)
      val back = Blosc.decompress(chunk)
      assert(back.sameElements(data), s"mismatch: codec=$c shuffle=$sh ts=$ts n=$n")
    }
  }

  test("multi-block with leftover block round-trips") {
    for (sh <- Seq(Blosc.NOSHUFFLE, Blosc.SHUFFLE, Blosc.BITSHUFFLE)) {
      val data = gradient(300000)
      val chunk = Blosc.compress(data, 2, "zstd", 3, sh, blocksize = 65536)
      // 4 full blocks + a 37856-byte leftover
      assert(ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN).getInt(8) == 65536)
      assert(Blosc.decompress(chunk).sameElements(data))
    }
  }

  test("header layout matches the c-blosc chunk format") {
    val data = gradient(4096)
    val chunk = Blosc.compress(data, 2, "zstd", 3, Blosc.SHUFFLE)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    assert((hb.get(0) & 0xff) == 2, "version")
    assert((hb.get(1) & 0xff) == 1, "versionlz")
    // flags: byte-shuffle (0x01) | dont-split (0x10) | zstd code 4 << 5
    assert((hb.get(2) & 0xff) == 0x91, f"flags 0x${hb.get(2) & 0xff}%02x")
    assert((hb.get(3) & 0xff) == 2, "typesize")
    assert(hb.getInt(4) == 4096, "nbytes")
    assert(hb.getInt(12) == chunk.length, "cbytes")
    // first bstart points just past header + bstarts table
    val nblocks = (4096 + hb.getInt(8) - 1) / hb.getInt(8)
    assert(hb.getInt(16) == 16 + 4 * nblocks, "bstart[0]")
  }

  test("compressor codes and shuffle flags per cname") {
    def flags(cname: String, sh: Int, ts: Int): Int = {
      val chunk = Blosc.compress(gradient(1024), ts, cname, 3, sh)
      ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN).get(2) & 0xff
    }
    assert(flags("lz4", Blosc.NOSHUFFLE, 2) == (0x10 | (1 << 5)))
    assert(flags("lz4hc", Blosc.NOSHUFFLE, 2) == (0x10 | (1 << 5)))
    assert(flags("snappy", Blosc.NOSHUFFLE, 2) == (0x10 | (2 << 5)))
    assert(flags("zlib", Blosc.NOSHUFFLE, 2) == (0x10 | (3 << 5)))
    assert(flags("zstd", Blosc.NOSHUFFLE, 2) == (0x10 | (4 << 5)))
    // byte shuffle with typesize 1 is an identity: flag must be CLEARED
    assert((flags("zstd", Blosc.SHUFFLE, 1) & 0x01) == 0)
    // autoshuffle: bitshuffle at typesize 1, byte shuffle otherwise
    assert((flags("zstd", Blosc.AUTOSHUFFLE, 1) & 0x04) != 0)
    assert((flags("zstd", Blosc.AUTOSHUFFLE, 4) & 0x01) != 0)
  }

  test("incompressible input falls back to memcpy mode") {
    val data = pseudoRandom(4096)
    val chunk = Blosc.compress(data, 2, "zstd", 3, Blosc.NOSHUFFLE)
    val flags = chunk(2) & 0xff
    assert((flags & 0x02) != 0, "memcpy flag")
    assert(chunk.length == 16 + data.length)
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("clevel 0 is stored verbatim (memcpy mode)") {
    val data = gradient(1000)
    val chunk = Blosc.compress(data, 2, "zstd", clevel = 0)
    assert((chunk(2) & 0x02) != 0)
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("empty buffer round-trips as a header-only chunk") {
    val chunk = Blosc.compress(Array.emptyByteArray, 2, "zstd", 3)
    assert(chunk.length == 16)
    assert(Blosc.decompress(chunk).isEmpty)
  }

  test("blosclz is rejected on compress; malformed blosclz chunks fail loudly") {
    intercept[RuntimeException](Blosc.compress(gradient(64), 1, "blosclz"))
    // flags claim blosclz (code 0) but the body is garbage: decode must
    // throw, never return wrong bytes
    val bogus = new Array[Byte](24)
    val hb = ByteBuffer.wrap(bogus).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte); hb.put(0x10.toByte); hb.put(1.toByte)
    hb.putInt(4); hb.putInt(4); hb.putInt(24)
    hb.putInt(20) // bstart[0]
    hb.putInt(0x7fffffff) // absurd clen
    intercept[IllegalArgumentException](Blosc.decompress(bogus))
  }

  test("blosclz: hand-built stream decodes (literals, match, extended len, RLE)") {
    // expected output: "abc" + 9-byte match at distance 3 + "Q"*5 + "xyz"
    val want = ("abc" + "abcabcabc" + "QQQQQ" + "xyz").getBytes("ASCII")
    val stream = Array[Int](
      0x02, 'a', 'b', 'c',    // first ctrl (masked &31): literal run of 3
      0xE0, 0x00, 0x02,       // match: len=(7-1)+ext(0)=6 -> 9 bytes, dist=0+2+1=3
      0x00, 'Q',              // literal run of 1
      0x40, 0x00,             // match: len=(2-1)... (2<<5): len=1 -> 4 bytes, dist=1 (RLE)
      0x02, 'x', 'y', 'z'     // literal run of 3
    ).map(_.toByte)
    val out = new Array[Byte](want.length)
    Blosc.decompressBloscLz(stream, 0, stream.length, out, 0, want.length)
    assert(out.sameElements(want))
  }

  test("blosclz: far match (16-bit offset) and a full chunk container decode") {
    // 8320 distinct-ish literal bytes via max-length (32) literal runs,
    // then a far match of 20 bytes at distance 8192+100
    val n = 8320
    val lit = Array.tabulate(n)(i => (i % 251).toByte)
    val body = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      body.write(31) // literal run of 32 (first ctrl is masked &31 -> still 31)
      body.write(lit, i, 32)
      i += 32
    }
    // far match: ctrl 0xFF (len saturated, ofs=31<<8), ext len 11 -> 6+11+3=20
    // bytes, code=255 triggers far path, 16-bit BE offset 100 -> dist 8292
    body.write(0xFF); body.write(11); body.write(0xFF); body.write(0x00); body.write(100)
    val stream = body.toByteArray
    val dist = 8192 + 100
    val want = lit ++ Array.tabulate(20)(k => lit(n - dist + k))
    val out = new Array[Byte](want.length)
    Blosc.decompressBloscLz(stream, 0, stream.length, out, 0, want.length)
    assert(out.sameElements(want))
    // same stream wrapped in a c-blosc chunk container (ccode=0, dont-split)
    val chunk = new Array[Byte](16 + 4 + 4 + stream.length)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte)
    hb.put(0x10.toByte) // dont-split, noshuffle, compressor code 0 = blosclz
    hb.put(1.toByte)
    hb.putInt(want.length); hb.putInt(want.length); hb.putInt(chunk.length)
    hb.putInt(20) // bstart[0]
    hb.putInt(stream.length); hb.put(stream)
    assert(Blosc.decompress(chunk).sameElements(want))
  }

  test("blosclz: split chunk with RLE streams decodes (foreign v2 store shape)") {
    // the layout real pre-1.14 c-blosc writes for a compressible uint16
    // block: typesize streams, each blosclz-compressed — here each plane is
    // a constant run: 1 literal + an extended-length RLE match
    val ts = 2
    val nel = 256
    val data = new Array[Byte](nel * ts)
    for (i <- 0 until nel) { data(2 * i) = 0x11; data(2 * i + 1) = 0x22 }
    def rlePlane(b: Byte): Array[Byte] = {
      // literal b, then match dist=1 len 255: 255 = (6 + ext) + 3 -> ext=246
      Array[Int](0x00, b & 0xff, 0xE0, 246, 0x00).map(_.toByte)
    }
    val streams = Seq(rlePlane(0x11), rlePlane(0x22))
    val bodyLen = streams.map(4 + _.length).sum
    val chunk = new Array[Byte](16 + 4 + bodyLen)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte)
    hb.put(0x01.toByte) // byte-shuffle, NO dont-split, compressor 0 = blosclz
    hb.put(ts.toByte)
    hb.putInt(nel * ts); hb.putInt(nel * ts); hb.putInt(chunk.length)
    hb.putInt(20)
    for (s <- streams) { hb.putInt(s.length); hb.put(s) }
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("split rule is shuffle-independent: unshuffled split lz4 chunk decodes") {
    // real c-blosc (pre-1.14; 1.14+ FORWARD_COMPAT for lz4/blosclz) splits
    // based on typesize/blocksize alone — an UNSHUFFLED block still splits
    val n = 1024
    val ts = 4
    val data = gradient(n)
    val lz4c = net.jpountz.lz4.LZ4Factory.fastestJavaInstance().fastCompressor()
    val streams = Array.tabulate(ts) { s =>
      val quarter = java.util.Arrays.copyOfRange(data, s * (n / ts), (s + 1) * (n / ts))
      val max = lz4c.maxCompressedLength(quarter.length)
      val out = new Array[Byte](max)
      val m = lz4c.compress(quarter, 0, quarter.length, out, 0, max)
      java.util.Arrays.copyOf(out, m)
    }
    val bodyLen = streams.map(4 + _.length).sum
    val chunk = new Array[Byte](16 + 4 + bodyLen)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte)
    hb.put((1 << 5).toByte) // lz4, NO shuffle, NO dont-split
    hb.put(ts.toByte)
    hb.putInt(n); hb.putInt(n); hb.putInt(chunk.length)
    hb.putInt(20)
    for (s <- streams) { hb.putInt(s.length); hb.put(s) }
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("decodes a hand-built pre-1.14 SPLIT chunk (shuffled, zlib streams)") {
    // 256 uint16-ish elements; split layout: the shuffled block's two
    // byte-planes compressed as separate streams, dont-split bit CLEAR
    val n = 512
    val ts = 2
    val data = gradient(n)
    // plane j holds byte j of every element (c-blosc byte shuffle)
    val planes = Array.tabulate(ts)(j => Array.tabulate(n / ts)(i => data(i * ts + j)))
    def zlib(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(b); d.finish()
      val out = new Array[Byte](b.length * 2 + 64)
      val m = d.deflate(out)
      d.end()
      java.util.Arrays.copyOf(out, m)
    }
    val streams = planes.map(zlib)
    val bodyLen = streams.map(4 + _.length).sum
    val chunk = new Array[Byte](16 + 4 + bodyLen) // header + 1 bstart + body
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte)
    hb.put((0x01 | (3 << 5)).toByte) // byte-shuffle, zlib, NO dont-split
    hb.put(ts.toByte)
    hb.putInt(n); hb.putInt(n); hb.putInt(chunk.length)
    hb.putInt(20) // bstart[0]
    for (s <- streams) { hb.putInt(s.length); hb.put(s) }
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("split chunk with a stored-raw stream (clen == stream length)") {
    val n = 512
    val ts = 2
    val data = pseudoRandom(n)
    val planes = Array.tabulate(ts)(j => Array.tabulate(n / ts)(i => data(i * ts + j)))
    val bodyLen = planes.map(4 + _.length).sum
    val chunk = new Array[Byte](16 + 4 + bodyLen)
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte)
    hb.put((0x01 | (4 << 5)).toByte) // byte-shuffle, zstd, NO dont-split
    hb.put(ts.toByte)
    hb.putInt(n); hb.putInt(n); hb.putInt(chunk.length)
    hb.putInt(20)
    for (p <- planes) { hb.putInt(p.length); hb.put(p) } // raw: clen == neblock/ts
    assert(Blosc.decompress(chunk).sameElements(data))
  }

  test("shuffle name map resolves the reference's strings (P8)") {
    assert(Blosc.ShuffleNames("noshuffle") == 0)
    assert(Blosc.ShuffleNames("shuffle") == 1)
    assert(Blosc.ShuffleNames("bitshuffle") == 2)
    assert(Blosc.ShuffleNames("autoshuffle") == -1)
  }

  test("property: arbitrary bytes round-trip across codec/shuffle/typesize/blocksize") {
    // seeded manual sampling (scalatestplus isn't on the offline
    // classpath — same approach as GeometrySpec)
    val r = new java.util.Random(20260812L)
    val typesizes = Array(1, 2, 3, 4, 8, 16)
    val shuffles = Array(Blosc.NOSHUFFLE, Blosc.SHUFFLE, Blosc.BITSHUFFLE)
    val codecs = Array("zstd", "lz4", "zlib", "snappy")
    val blocksizes = Array(0, 777, 4096)
    for (_ <- 0 until 120) {
      val n = r.nextInt(20001)
      val ts = typesizes(r.nextInt(typesizes.length))
      val sh = shuffles(r.nextInt(shuffles.length))
      val cname = codecs(r.nextInt(codecs.length))
      val bs = blocksizes(r.nextInt(blocksizes.length))
      val data = r.nextInt(3) match {
        case 0 => pseudoRandom(n, r.nextLong())
        case 1 => gradient(n)
        case _ => Array.fill(n)(42.toByte)
      }
      val back = Blosc.decompress(Blosc.compress(data, ts, cname, 3, sh, bs))
      assert(back.sameElements(data), s"n=$n ts=$ts sh=$sh cname=$cname bs=$bs")
    }
  }

  /** Independent re-derivation of the published bitshuffle scalar
    * algorithm (the c-blosc-vendored bitshuffle core), composed exactly as
    * the library composes it — so agreement with `Blosc.bitShuffle` checks
    * the LAYOUT (plane order + intra-plane bit packing), not just
    * self-inverseness:
    *   stage 1  byte-transpose: byte j of element i → row j, column i;
    *   stage 2  per 8 consecutive bytes, the Hacker's Delight 8×8 bit
    *            transpose (TRANS_BIT_8X8: masks AA../CCCC../F0F0F0F0),
    *            output byte k = bit-k plane of the 8 input bytes with
    *            input byte b at output bit position b;
    *   stage 3  bit-row regroup: sub-row (bit i, byte j) → row j*8+i.
    */
  private def bitshuffleReference(ts: Int, data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val nel = n / ts
    require(n % (ts * 8) == 0, "reference path needs whole 8-element groups")
    val s1 = new Array[Byte](n)
    for (i <- 0 until nel; j <- 0 until ts) s1(j * nel + i) = data(i * ts + j)
    val s2 = new Array[Byte](n)
    val nbyteRow = n / 8
    for (g <- 0 until n / 8) {
      var x = 0L
      for (b <- 0 until 8) x |= (s1(g * 8 + b) & 0xffL) << (8 * b)
      var t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AAL
      x = x ^ t ^ (t << 7)
      t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCCL
      x = x ^ t ^ (t << 14)
      t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0L
      x = x ^ t ^ (t << 28)
      for (k <- 0 until 8) s2(k * nbyteRow + g) = ((x >> (8 * k)) & 0xff).toByte
    }
    val out = new Array[Byte](n)
    val nelRow = nel / 8
    for (j <- 0 until ts; i <- 0 until 8)
      System.arraycopy(s2, (i * ts + j) * nelRow, out, (j * 8 + i) * nelRow, nelRow)
    out
  }

  test("bitshuffle matches the published scalar algorithm (independent reimpl)") {
    val r = new java.util.Random(20260813L)
    for (ts <- Seq(1, 2, 4, 8); groups <- Seq(1, 3, 16, 129)) {
      val n = ts * 8 * groups
      val data = new Array[Byte](n)
      r.nextBytes(data)
      val got = new Array[Byte](n)
      Blosc.bitShuffle(ts, data, 0, n, got)
      val want = bitshuffleReference(ts, data)
      assert(got.sameElements(want), s"ts=$ts groups=$groups")
      val back = new Array[Byte](n)
      Blosc.bitUnshuffle(ts, want, n, back, 0)
      assert(back.sameElements(data), s"unshuffle ts=$ts groups=$groups")
    }
  }

  test("bitshuffle golden vectors (hand-computed from the layout definition)") {
    // ts=2, 8 elements, element i = 1 << i (uint16 LE): plane k<8 (bit k of
    // the low byte) contains exactly element k -> packed LSB-first = 1<<k;
    // high-byte planes are all zero
    val d1 = new Array[Byte](16)
    for (i <- 0 until 8) d1(2 * i) = (1 << i).toByte
    val o1 = new Array[Byte](16)
    Blosc.bitShuffle(2, d1, 0, 16, o1)
    val want1 = Array[Int](0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
      0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(o1.sameElements(want1))
    // ts=1, 16 elements 0..15: plane k = bitmask of elements with bit k set,
    // two bytes LSB-first -> the classic AA/CC/F0/00FF pattern
    val d2 = Array.tabulate(16)(_.toByte)
    val o2 = new Array[Byte](16)
    Blosc.bitShuffle(1, d2, 0, 16, o2)
    val want2 = Array[Int](0xAA, 0xAA, 0xCC, 0xCC, 0xF0, 0xF0, 0x00, 0xFF,
      0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(o2.sameElements(want2))
  }

  test("bitshuffle bit-transpose: known 2-element example") {
    // ts=1, 16 elements: element i = 1 << (i % 8) — plane k must have
    // exactly the bits of the elements whose value has bit k set
    val data = Array.tabulate(16)(i => (1 << (i % 8)).toByte)
    val out = new Array[Byte](16)
    Blosc.bitShuffle(1, data, 0, 16, out)
    // plane k (2 bytes) = bitmask of elements with bit k: elements k and k+8
    for (k <- 0 until 8) {
      val plane = ((out(2 * k + 1) & 0xff) << 8) | (out(2 * k) & 0xff)
      assert(plane == ((1 << k) | (1 << (k + 8))), s"plane $k")
    }
    val back = new Array[Byte](16)
    Blosc.bitUnshuffle(1, out, 16, back, 0)
    assert(back.sameElements(data))
  }
}
