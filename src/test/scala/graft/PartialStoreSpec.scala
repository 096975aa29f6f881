package graft

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geometry.Shape3
import graft.plans.PartialStore

/** Roundtrip + scratch-reuse behavior of the fused-downsample partial
  * blob format (12-byte int32-BE dims header + zstd-1 int16-LE payload).
  * The Scratch object is deliberately shared across calls of DIFFERENT
  * sizes — the per-partition reuse pattern of the conversion waves —
  * so stale bytes from a larger previous payload must never leak into a
  * smaller later one.
  */
class PartialStoreSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private val dir = java.nio.file.Files.createTempDirectory("partialstore").toString

  private def volume(shape: Shape3, seed: Int): Array[Short] = {
    val rnd = new java.util.Random(seed)
    Array.fill(shape.voxels.toInt)((rnd.nextInt(65536) - 32768).toShort)
  }

  test("write/readInto roundtrips voxel-exactly through one shared scratch") {
    val scratch = new PartialStore.Scratch
    // big → small → medium: exercises grow-then-reuse with stale tails
    val shapes = Seq(Shape3(8, 16, 16), Shape3(2, 3, 5), Shape3(4, 8, 8))
    for ((shape, i) <- shapes.zipWithIndex) {
      val data = volume(shape, seed = 7 * i + 1)
      val path = s"$dir/p$i"
      PartialStore.write(conf, path, data, shape, scratch)
      val out = new Array[Short](shape.voxels.toInt + 13) // oversized buffer
      PartialStore.readInto(conf, path, shape, out, scratch)
      assert(out.take(shape.voxels.toInt).sameElements(data),
        s"roundtrip mismatch for shape $shape")
    }
  }

  test("oversized data buffer: only shape.voxels leading elements are written") {
    val scratch = new PartialStore.Scratch
    val shape = Shape3(3, 4, 5)
    val data = volume(shape, seed = 99) ++ Array.fill(17)(12345.toShort)
    PartialStore.write(conf, s"$dir/pover", data, shape, scratch)
    val out = new Array[Short](shape.voxels.toInt)
    PartialStore.readInto(conf, s"$dir/pover", shape, out, new PartialStore.Scratch)
    assert(out.sameElements(data.take(shape.voxels.toInt)))
  }

  test("dims mismatch against planner geometry fails loudly") {
    val scratch = new PartialStore.Scratch
    val shape = Shape3(2, 2, 2)
    PartialStore.write(conf, s"$dir/pdim", volume(shape, 5), shape, scratch)
    val e = intercept[IllegalArgumentException] {
      PartialStore.readInto(conf, s"$dir/pdim", Shape3(2, 2, 3),
        new Array[Short](12), scratch)
    }
    assert(e.getMessage.contains("planner expected"))
  }
}
