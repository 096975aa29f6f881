package graft.sources

import graft.core.Geometry.{Shape3, TrueShape}

/** Imaris (.ims) semantics over [[Hdf5Reader]] — the metadata contracts of
  * the reference's `ImarisReader` (`utils/io_utils.py`).
  */
object Imaris {

  /** Dataset path for one (level, timepoint, channel) — hard-coded layout
    * (`io_utils.py:43`, `compress/imaris_to_zarr.py:1333-1335`).
    */
  def dataPath(level: Int, timePoint: Int = 0, channel: Int = 0): String =
    s"/DataSet/ResolutionLevel $level/TimePoint $timePoint/Channel $channel/Data"

  val imageInfoPath = "/DataSetInfo/Image"

  /** Planning-time metadata for one Imaris file: everything the driver
    * needs to build shard grids without touching voxel data
    * (reference metadata getters `io_utils.py:430-637`).
    */
  final case class Meta(
      trueShape0: TrueShape,          // authoritative Z,Y,X from attrs (X7)
      storedShapes: Seq[Shape3],      // HDF5 (padded) dims per level
      trueShapes: Seq[Shape3],        // ratio-walked unpadded dims per level
      chunk: Shape3,                  // native HDF5 chunk of level 0
      voxelSizeUm: (Double, Double, Double), // Z,Y,X µm
      originUm: (Double, Double, Double),    // Z,Y,X µm (ExtMin2,1,0)
      numLevels: Int
  )

  /** Read all planning metadata (driver-side, one open per file). */
  def readMeta(path: String): Meta =
    readMeta(path, new org.apache.hadoop.conf.Configuration())

  /** Same, with an explicit Hadoop conf (required for s3a:// credentials
    * configured via spark.hadoop.* — a bare Configuration drops them). */
  def readMeta(path: String, conf: org.apache.hadoop.conf.Configuration): Meta = {
    val r = new Hdf5Reader(path, conf)
    try readMeta(r)
    finally r.close()
  }

  def readMeta(r: Hdf5Reader): Meta = {
    val attrs = r.attributes(imageInfoPath)
    def attrLong(k: String): Long = attrs(k).trim.toLong
    def attrDouble(k: String): Double = attrs(k).trim.toDouble
    // authoritative unpadded shape: Z/Y/X attributes (io_utils.py:452-466)
    val true0 = TrueShape(Shape3(attrLong("Z"), attrLong("Y"), attrLong("X")))

    // probe levels until missing (io_utils.py:620-637)
    val stored = Iterator.from(0)
      .map(l => r.resolve(dataPath(l)))
      .takeWhile(_.isDefined)
      .map(_ => ())
      .zipWithIndex
      .map { case (_, l) => l }
      .toSeq
      .map { l =>
        val ds = r.openDataset(dataPath(l))
        Shape3(ds.shape(0), ds.shape(1), ds.shape(2))
      }
    require(stored.nonEmpty, s"${r.path}: no resolution levels")

    val trueShapes = graft.core.Geometry.trueShapesPerLevel(true0, stored)
    val ds0 = r.openDataset(dataPath(0))
    val chunk = Shape3(ds0.chunk(0), ds0.chunk(1), ds0.chunk(2))

    // physical extents: index 0=X, 1=Y, 2=Z (io_utils.py:561-618)
    val (minX, minY, minZ) = (attrDouble("ExtMin0"), attrDouble("ExtMin1"), attrDouble("ExtMin2"))
    val (maxX, maxY, maxZ) = (attrDouble("ExtMax0"), attrDouble("ExtMax1"), attrDouble("ExtMax2"))
    val t = true0.shape
    val voxel = (
      (maxZ - minZ) / t.z.toDouble,
      (maxY - minY) / t.y.toDouble,
      (maxX - minX) / t.x.toDouble)

    Meta(true0, stored, trueShapes, chunk, voxel, (minZ, minY, minX), stored.length)
  }
}
