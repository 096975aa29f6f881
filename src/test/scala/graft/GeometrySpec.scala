package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry
import graft.core.Geometry._

/** Properties for the shard-math kernel (upgrade of the reference's
  * hand-rolled coverage proof, `tests/test_imaris_to_zarr_parallel.py:185-201`,
  * and spec-clamp goldens `tests/test_downsample_pyramid.py:347-372`).
  * Property style: 200 seeded random cases + pinned edge cases
  * (scalatestplus isn't on the offline classpath, so sampling is manual).
  */
class GeometrySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def cases(n: Int)(gen: scala.util.Random => Seq[Long]): Seq[Seq[Long]] =
    Seq.fill(n)(gen(rnd)) ++ Seq(
      Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L),
      Seq(200L, 1L, 200L, 64L, 1L, 64L, 64L, 1L, 64L),
      Seq(63L, 65L, 64L, 64L, 64L, 64L, 64L, 64L, 64L))

  test("shard tasks tile the true shape exactly: full coverage, no overlap") {
    for (c <- cases(200)(r => Seq.fill(3)(1L + r.nextInt(200)) ++ Seq.fill(3)(1L + r.nextInt(64)))) {
      val Seq(z, y, x, sz, sy, sx) = c.take(6)
      val shape = Shape3(z, y, x)
      val tasks = Geometry.shardTasks("f", 0, TrueShape(shape), Shape3(sz, sy, sx))
      val covered = tasks.map(_.region.voxels).sum
      assert(covered == shape.voxels)
      // no overlap: spans per axis must partition [0, extent)
      val zSpans = tasks.map(t => (t.z0, t.z1)).distinct.sorted
      assert(zSpans.head._1 == 0 && zSpans.last._2 == z)
      zSpans.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) => assert(hi == lo)
        case _ =>
      }
    }
  }

  test("ceilDiv golden cases") {
    assert(Geometry.ceilDiv(0, 5) == 0)
    assert(Geometry.ceilDiv(1, 5) == 1)
    assert(Geometry.ceilDiv(5, 5) == 1)
    assert(Geometry.ceilDiv(6, 5) == 2)
  }

  test("downsampledShape matches reference ceiling-division goldens") {
    // tests/test_downsample_pyramid.py:169-242
    assert(Geometry.downsampledShape(Shape3(64, 128, 128), Shape3(2, 2, 2)) == Shape3(32, 64, 64))
    assert(Geometry.downsampledShape(Shape3(33, 65, 17), Shape3(2, 2, 2)) == Shape3(17, 33, 9))
    assert(Geometry.downsampledShape(Shape3(60, 120, 240), Shape3(1, 2, 2)) == Shape3(60, 60, 120))
  }

  test("clampSpec invariants (reference imaris_to_zarr.py:205-220)") {
    for (c <- cases(200)(r => Seq.fill(3)(1L + r.nextInt(200)) ++ Seq.fill(6)(1L + r.nextInt(64)))) {
      val Seq(z, y, x, cz, cy, cx, sz, sy, sx) = c.take(9)
        val data = Shape3(z, y, x)
        val (chunk, shard) = Geometry.clampSpec(data, Shape3(cz, cy, cx), Shape3(sz, sy, sx))
        // chunk clamped to data
        assert(chunk.z <= math.max(1, z) && chunk.y <= math.max(1, y) && chunk.x <= math.max(1, x))
        // shard is a positive multiple of chunk
        assert(shard.z % chunk.z == 0 && shard.z >= chunk.z)
        assert(shard.y % chunk.y == 0 && shard.y >= chunk.y)
        assert(shard.x % chunk.x == 0 && shard.x >= chunk.x)
        // shard never exceeds the chunk-aligned cover of the data
        assert(shard.z <= Geometry.ceilDiv(z, chunk.z) * chunk.z)
        // exact reference formula (clamp to data FIRST, then chunk-align
        // down, then at least one chunk) — layout-identical stores
        def ref(n: Long, c: Long, s0: Long): Long =
          math.max(c, (math.min(s0, n) / c) * c)
        assert(shard.z == ref(z, chunk.z, sz))
        assert(shard.y == ref(y, chunk.y, sy))
        assert(shard.x == ref(x, chunk.x, sx))
    }
    // the divergence case the reference order decides: data=95 chunk=10
    // shard=100 → 90 (align-before-clamp would say 100)
    val (_, s) = Geometry.clampSpec(Shape3(95, 95, 95), Shape3(10, 10, 10), Shape3(100, 100, 100))
    assert(s == Shape3(90, 90, 90))
  }

  test("true-shape ratio walk (reference io_utils.py:468-525)") {
    // pyramid fixture: true (64,128,128), stored (64,128,128),(32,64,64),(16,32,32)
    val walked = Geometry.trueShapesPerLevel(
      TrueShape(Shape3(64, 128, 128)),
      Seq(Shape3(64, 128, 128), Shape3(32, 64, 64), Shape3(16, 32, 32)))
    assert(walked == Seq(Shape3(64, 128, 128), Shape3(32, 64, 64), Shape3(16, 32, 32)))
    // padded: true (100,100,100) stored (128,128,128) single level
    val one = Geometry.trueShapesPerLevel(TrueShape(Shape3(100, 100, 100)), Seq(Shape3(128, 128, 128)))
    assert(one == Seq(Shape3(100, 100, 100)))
    // aniso: stored (64,128,256) -> (64,64,128) infers factors (1,2,2)
    val f = Geometry.stepFactors(Seq(Shape3(64, 128, 256), Shape3(64, 64, 128)))
    assert(f == Seq(Shape3(1, 2, 2)))
    val aniso = Geometry.trueShapesPerLevel(
      TrueShape(Shape3(60, 120, 240)), Seq(Shape3(64, 128, 256), Shape3(64, 64, 128)))
    assert(aniso == Seq(Shape3(60, 120, 240), Shape3(60, 60, 120)))
  }

  test("shardRegion clamps the edge shard") {
    val r = Geometry.shardRegion((1L, 0L, 0L), Shape3(32, 32, 32), Shape3(50, 20, 10))
    assert(r == Region3(Span(32, 50), Span(0, 20), Span(0, 10)))
  }
}
