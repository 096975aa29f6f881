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

  test("blosclz is rejected on compress and decode") {
    intercept[RuntimeException](Blosc.compress(gradient(64), 1, "blosclz"))
    // a chunk whose flags claim compressor code 0 (blosclz)
    val bogus = new Array[Byte](20)
    val hb = ByteBuffer.wrap(bogus).order(ByteOrder.LITTLE_ENDIAN)
    hb.put(2.toByte); hb.put(1.toByte); hb.put(0x10.toByte); hb.put(1.toByte)
    hb.putInt(4); hb.putInt(4); hb.putInt(20)
    intercept[IllegalArgumentException](Blosc.decompress(bogus))
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
