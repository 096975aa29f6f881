package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.OmeNgff

class OmeNgffSpec extends AnyFunSuite {

  test("translation golden: [0, 0.5, 1.5, 3.5, 7.5] µm (reference tests/test_translation_fix.py:88-94)") {
    // unit voxels, factors (1,2,2) on Y/X, 5 levels
    val origins = OmeNgff.downscaleOrigin(
      origin = (0.0, 0.0, 0.0), voxel = (1.0, 1.0, 1.0),
      factor = (1L, 2L, 2L), nLevels = 5)
    val yTranslations = origins.map(_(3))
    assert(yTranslations == Seq(0.0, 0.5, 1.5, 3.5, 7.5))
    val xTranslations = origins.map(_(4))
    assert(xTranslations == Seq(0.0, 0.5, 1.5, 3.5, 7.5))
    val zTranslations = origins.map(_(2))
    assert(zTranslations == Seq(0.0, 0.0, 0.0, 0.0, 0.0)) // factor 1 → no shift
  }

  test("scales multiply by the factor per level (reference _compute_scales)") {
    val s = OmeNgff.computeScales(4, (2.0, 2.0, 2.0), (1.0, 0.748, 0.748))
    assert(s(0) == ((1.0, 0.748, 0.748)))
    assert(s(1) == ((2.0, 1.496, 1.496)))
    assert(s(3) == ((8.0, 5.984, 5.984)))
  }

  test("root metadata structure: ome 0.5, multiscales, omero, per-level transforms") {
    val json = OmeNgff.rootMetadata(
      "tile_0", nLevels = 3, factor = (2L, 2L, 2L),
      voxelSizeUm = (1.0, 0.748, 0.748), originUm = Some((0.0, 0.0, 0.0))).render
    assert(json.contains(""""zarr_format":3"""))
    assert(json.contains(""""node_type":"group""""))
    assert(json.contains(""""version":"0.5""""))
    assert(json.contains(""""multiscales""""))
    assert(json.contains(""""omero""""))
    assert(json.contains(""""path":"0""""))
    assert(json.contains(""""path":"2""""))
    assert(json.contains(""""scale":[1.0,1.0,1.0,0.748,0.748]"""))
    assert(json.contains(""""scale":[1.0,1.0,2.0,1.496,1.496]"""))
    assert(json.contains(""""translation":[0.0,0.0,0.0,0.0,0.0]"""))
    // level-1 origin shift: voxel·(f-1)/2 = 0.5, 0.374, 0.374
    assert(json.contains(""""translation":[0.0,0.0,0.5,0.374,0.374]"""))
    // axes golden
    assert(json.contains(""""name":"t","type":"time","unit":"millisecond""""))
    assert(json.contains(""""name":"x","type":"space","unit":"micrometer""""))
  }

  test("validation rejects inconsistent metadata") {
    intercept[IllegalArgumentException] {
      OmeNgff.validate(3, Seq((1.0, 1.0, 1.0)), None)
    }
    intercept[IllegalArgumentException] {
      OmeNgff.validate(1, Seq((0.0, 1.0, 1.0)), None)
    }
  }
}
