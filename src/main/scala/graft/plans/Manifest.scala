package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._
import scala.util.Try

/** acquisition.json manifest handling (reference P5–P7:
  * `imaris_job.py:114-215` voxel resolution with schema dispatch,
  * `:256-307` tile translation, `utils/utils.py:114-146` tolerant read).
  */
object Manifest {

  private val mapper = new ObjectMapper()

  /** Tolerant JSON read: missing or corrupt → None (reference
    * `read_json_as_dict` returns `{}`, `utils/utils.py:134-146`).
    */
  def readJson(conf: Configuration, pathStr: String): Option[JsonNode] =
    Try {
      val p = new Path(pathStr)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(mapper.readTree(in))
        finally in.close()
      }
    }.toOption.flatten

  /** Path of the acquisition.json expected one directory above
    * `inputSource` (`imaris_job.py:362-367`). None when the input has no
    * parent (filesystem or bucket root) — naive string surgery on such
    * inputs used to yield `/acquisition.json`.
    */
  def parentManifestPath(inputSource: String): Option[String] =
    Try(Option(new Path(inputSource).getParent)).toOption.flatten
      .map(p => new Path(p, "acquisition.json").toString)

  /** Numeric triple version compare ("2.0.0" dispatch, `imaris_job.py:131-139`). */
  def versionAtLeast(v: String, major: Int): Boolean =
    Try(v.split("[.]")(0).toInt >= major).getOrElse(false)

  /** Voxel resolution [Z,Y,X] µm from the manifest. Schema <2: first
    * tile's scale transform; schema >=2: nested data_streams path.
    * Scale values are stored [X,Y,Z] and re-ordered (NOT unit-converted —
    * only translations are mm; reference `:148-155` vs `:292-301`).
    */
  def voxelResolution(manifest: JsonNode): Option[(Double, Double, Double)] = Try {
    val schema = Option(manifest.get("schema_version")).map(_.asText).getOrElse("0.0.0")
    val scale =
      if (versionAtLeast(schema, 2)) {
        val xforms = manifest.get("data_streams").get(0)
          .get("configurations").get(0)
          .get("images").get(0)
          .get("image_to_acquisition_transform")
        xforms.elements().asScala
          .find(t => Option(t.get("object_type")).exists(_.asText == "Scale"))
          .get.get("scale")
      } else {
        val xforms = manifest.get("tiles").get(0).get("coordinate_transformations")
        xforms.elements().asScala
          .find(t => Option(t.get("type")).exists(_.asText == "scale"))
          .get.get("scale")
      }
    val x = scale.get(0).asText.toDouble
    val y = scale.get(1).asText.toDouble
    val z = scale.get(2).asText.toDouble
    (z, y, x)
  }.toOption

  /** Tile translation for `tileFileName`: [X,Y,Z] mm → [Z,Y,X] µm ×1000
    * (`_MM_TO_UM`, `imaris_job.py:260`); wrong length or absent → None
    * (falls back to the Imaris ExtMin origin).
    */
  def tileTranslationUm(manifest: JsonNode, tileFileName: String): Option[(Double, Double, Double)] = Try {
    val MmToUm = 1000.0
    manifest.get("tiles").elements().asScala
      .find(t => Option(t.get("file_name")).exists(_.asText == tileFileName))
      .flatMap { tile =>
        tile.get("coordinate_transformations").elements().asScala
          .find(t => Option(t.get("type")).exists(_.asText == "translation"))
          .flatMap { tr =>
            val raw = tr.get("translation")
            if (raw == null || raw.size != 3) None
            else Some((
              raw.get(2).asText.toDouble * MmToUm,
              raw.get(1).asText.toDouble * MmToUm,
              raw.get(0).asText.toDouble * MmToUm))
          }
      }
  }.toOption.flatten
}
