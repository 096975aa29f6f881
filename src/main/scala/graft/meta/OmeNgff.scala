package graft.meta

import graft.core.Json
import graft.core.Json._

/** OME-NGFF 0.5 metadata generation (reference M1–M7,
  * `compress/omezarr_metadata.py`). Pure functions, driver-side, O(KB).
  */
object OmeNgff {

  /** Fixed 5-D axes t/c/z/y/x (reference `_get_axes_5d`,
    * `omezarr_metadata.py:198-219`).
    */
  def axes5d(timeUnit: String = "millisecond", spaceUnit: String = "micrometer"): JValue =
    arr(
      obj("name" -> str("t"), "type" -> str("time"), "unit" -> str(timeUnit)),
      obj("name" -> str("c"), "type" -> str("channel")),
      obj("name" -> str("z"), "type" -> str("space"), "unit" -> str(spaceUnit)),
      obj("name" -> str("y"), "type" -> str("space"), "unit" -> str(spaceUnit)),
      obj("name" -> str("x"), "type" -> str("space"), "unit" -> str(spaceUnit))
    )

  /** Per-level (Z,Y,X) voxel scales: level l = pixel · factorˡ (reference
    * `_compute_scales`, `omezarr_metadata.py:99-195`).
    */
  def computeScales(
      nLevels: Int,
      factor: (Double, Double, Double),
      pixel: (Double, Double, Double)): Seq[(Double, Double, Double)] =
    Iterator.iterate(pixel) { case (z, y, x) =>
      (z * factor._1, y * factor._2, x * factor._3)
    }.take(nLevels).toSeq

  /** Per-level origins with the half-voxel center shift (reference
    * `_downscale_origin`, `omezarr_metadata.py:346-398`): each level's
    * origin += voxel·(factor−1)/2 of the PREVIOUS level, voxel ×= factor.
    * Golden: unit voxels, factors (1,2,2) on Y/X give the translation
    * pattern [0, 0.5, 1.5, 3.5, 7.5] µm (`tests/test_translation_fix.py:88-94`).
    */
  def downscaleOrigin(
      origin: (Double, Double, Double),
      voxel: (Double, Double, Double),
      factor: (Long, Long, Long),
      nLevels: Int): Seq[Seq[Double]] = {
    var o = origin
    var v = voxel
    val out = Seq.newBuilder[Seq[Double]]
    out += Seq(0.0, 0.0, o._1, o._2, o._3)
    for (_ <- 1 until nLevels) {
      o = (
        o._1 + v._1 * (factor._1 - 1) / 2.0,
        o._2 + v._2 * (factor._2 - 1) / 2.0,
        o._3 + v._3 * (factor._3 - 1) / 2.0)
      v = (v._1 * factor._1, v._2 * factor._2, v._3 * factor._3)
      out += Seq(0.0, 0.0, o._1, o._2, o._3)
    }
    out.result()
  }

  /** OMERO channel block with defaults (reference `_build_ome`,
    * `omezarr_metadata.py:36-96`).
    */
  def omero(imageName: String, nChannels: Int): JValue =
    obj(
      "channels" -> arr(
        (0 until nChannels).map { i =>
          obj(
            "active" -> bool(true),
            "coefficient" -> num(1),
            "color" -> str(f"$i%06x"),
            "family" -> str("linear"),
            "inverted" -> bool(false),
            "label" -> str(s"Channel:$imageName:$i"),
            "window" -> obj(
              "end" -> num(1.0), "max" -> num(1.0),
              "min" -> num(0.0), "start" -> num(0.0))
          )
        }: _*
      )
    )

  /** Validation of the assembled pieces (reference M5,
    * `omezarr_metadata.py:222-282`, `:326-343` — we own the checks since
    * no JVM ome-zarr library exists).
    */
  def validate(
      nLevels: Int,
      scales: Seq[(Double, Double, Double)],
      origins: Option[Seq[Seq[Double]]]): Unit = {
    require(nLevels >= 1, "need at least one level")
    require(scales.length == nLevels, s"${scales.length} scales for $nLevels levels")
    origins.foreach { os =>
      require(os.length == nLevels, s"${os.length} origins for $nLevels levels")
      require(os.forall(_.length == 5), "origins must be 5-D")
    }
    require(scales.forall(s => s._1 > 0 && s._2 > 0 && s._3 > 0), "scales must be positive")
  }

  /** Root group zarr.json: zarr_format 3 + ome.version 0.5 + multiscales
    * + omero (reference `write_ome_ngff_metadata`,
    * `omezarr_metadata.py:401-496`; assembly `:445-449`, `:483`).
    */
  def rootMetadata(
      imageName: String,
      nLevels: Int,
      factor: (Long, Long, Long),
      voxelSizeUm: (Double, Double, Double),
      originUm: Option[(Double, Double, Double)]): JValue =
    obj(
      "zarr_format" -> num(3),
      "node_type" -> str("group"),
      "attributes" -> omeAttributes(imageName, nLevels, factor, voxelSizeUm, originUm)
    )

  /** The OME attributes payload alone — the v3 root wraps it in a group
    * zarr.json; the v2 writer stores the same content as `.zattrs`
    * (reference v2 path: `root.attrs.update(metadata_dict)`,
    * `imaris_to_zarr.py:985`).
    */
  def omeAttributes(
      imageName: String,
      nLevels: Int,
      factor: (Long, Long, Long),
      voxelSizeUm: (Double, Double, Double),
      originUm: Option[(Double, Double, Double)]): JValue = {

    val scales = computeScales(
      nLevels,
      (factor._1.toDouble, factor._2.toDouble, factor._3.toDouble),
      voxelSizeUm)
    val origins = originUm.map(o => downscaleOrigin(o, voxelSizeUm, factor, nLevels))
    validate(nLevels, scales, origins)

    val datasets = (0 until nLevels).map { l =>
      val s = scales(l)
      val transforms = Seq(
        obj("type" -> str("scale"),
          "scale" -> arr(num(1.0), num(1.0), num(s._1), num(s._2), num(s._3)))
      ) ++ origins.map { os =>
        obj("type" -> str("translation"),
          "translation" -> arr(os(l).map(num): _*))
      }
      obj(
        "path" -> str(l.toString),
        "coordinateTransformations" -> arr(transforms: _*)
      )
    }

    obj(
      "ome" -> obj(
        "version" -> str("0.5"),
        "multiscales" -> arr(
          obj(
            "name" -> str(imageName),
            "axes" -> axes5d(),
            "datasets" -> arr(datasets: _*),
            "type" -> str("mode"),
            // provenance stamp (reference M7 names its engine; ours
            // names the Spark method)
            "metadata" -> obj(
              "description" -> str("Downscaling via Spark block-local window reduce"),
              "method" -> str("graft.spark.downsample"),
              "args" -> str("[false]"),
              "kwargs" -> obj()
            )
          )
        ),
        "omero" -> omero(imageName, 1)
      )
    )
  }
}
