package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.Geometry.Shape3
import graft.sinks.ZarrV3

/** DataSource V2 `zarr3voxels` READER: one Zarr v3 sharded level as a
  * voxel table `(z, y, x LONG, v INT)` — the analytics-side complement
  * of the `zarr3` sink, so converted stores are queryable with plain
  * SQL:
  * {{{
  *   spark.read.format("zarr3voxels").load(levelDir)
  *     .where("z BETWEEN 100 AND 200 AND v > 1000")
  *     .groupBy("z").agg(avg("v"))
  * }}}
  *
  * Spark-first mechanics:
  *  - geometry is self-describing (parsed from the level's `zarr.json`;
  *    no options);
  *  - one InputPartition per EXISTING shard file (one `listStatus` walk,
  *    not per-shard probes);
  *  - z/y/x range predicates are pushed down
  *    (`SupportsPushDownFilters`): the scan intersects every shard's
  *    extent with the requested bounding box and PRUNES non-overlapping
  *    shards driver-side — a `WHERE z BETWEEN a AND b` touches only the
  *    shard files it must, exactly like partition pruning on a
  *    partitioned table. Pushed filters are also re-applied voxel-level
  *    in the reader (and conservatively returned as residual, so new
  *    predicate shapes stay correct by construction);
  *  - column pruning (`SupportsPushDownRequiredColumns`) reaches the
  *    row builder — `SELECT sum(v)` never materializes coordinates.
  *
  * At 100 TB: shards are ~256 MB units, so the scan parallelizes as one
  * task per shard with no shuffle; coordinate predicates prune I/O
  * before any byte is read.
  */
class Zarr3VoxelSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr3voxels"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Zarr3VoxelSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new Zarr3VoxelTable(properties.asScala.toMap)
}

object Zarr3VoxelSource {
  val schema: StructType = StructType(Seq(
    StructField("z", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("v", IntegerType, nullable = false)))

  /** Inclusive voxel bounding box (whole-array by default). */
  final case class Box(
      z0: Long = 0L, z1: Long = Long.MaxValue,
      y0: Long = 0L, y1: Long = Long.MaxValue,
      x0: Long = 0L, x1: Long = Long.MaxValue) {
    def tighten(col: String, lo: Long, hi: Long): Box = col match {
      case "z" => copy(z0 = math.max(z0, lo), z1 = math.min(z1, hi))
      case "y" => copy(y0 = math.max(y0, lo), y1 = math.min(y1, hi))
      case "x" => copy(x0 = math.max(x0, lo), x1 = math.min(x1, hi))
      case _ => this
    }
  }

  /** Parse (shape, shard, chunk) from a level's zarr.json (the 5-D
    * T,C,Z,Y,X metadata the writer emits; T=C=1 dropped).
    */
  def levelGeometry(conf: org.apache.hadoop.conf.Configuration,
                    levelDir: String): (Shape3, Shape3, Shape3) = {
    val root = new ObjectMapper().readTree(
      new String(ZarrV3.read(conf, s"$levelDir/zarr.json"), "UTF-8"))
    def shp(n: com.fasterxml.jackson.databind.JsonNode): Shape3 = {
      require(n != null && n.isArray && n.size == 5, s"$levelDir: expected 5-D dims")
      Shape3(n.get(2).asLong, n.get(3).asLong, n.get(4).asLong)
    }
    val shape = shp(root.get("shape"))
    val shard = shp(root.get("chunk_grid").get("configuration").get("chunk_shape"))
    val sharding = root.get("codecs").get(0)
    require(sharding.get("name").asText == "sharding_indexed",
      s"$levelDir: not a sharded level")
    val chunk = shp(sharding.get("configuration").get("chunk_shape"))
    (shape, shard, chunk)
  }
}

final class Zarr3VoxelTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path", sys.error("zarr3voxels requires a path"))
  override def name(): String = s"zarr3voxels($path)"
  override def schema(): StructType = Zarr3VoxelSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Zarr3VoxelScanBuilder(path)
}

final class Zarr3VoxelScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import Zarr3VoxelSource.Box

  private var box = Box()
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = Zarr3VoxelSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val coords = Set("z", "y", "x")
    accepted = filters.filter {
      case EqualTo(c, v: Long) if coords(c) => box = box.tighten(c, v, v); true
      case EqualTo(c, v: Int) if coords(c) => box = box.tighten(c, v, v); true
      case GreaterThan(c, v: Long) if coords(c) => box = box.tighten(c, v + 1, Long.MaxValue); true
      case GreaterThan(c, v: Int) if coords(c) => box = box.tighten(c, v + 1L, Long.MaxValue); true
      case GreaterThanOrEqual(c, v: Long) if coords(c) => box = box.tighten(c, v, Long.MaxValue); true
      case GreaterThanOrEqual(c, v: Int) if coords(c) => box = box.tighten(c, v, Long.MaxValue); true
      case LessThan(c, v: Long) if coords(c) => box = box.tighten(c, Long.MinValue, v - 1); true
      case LessThan(c, v: Int) if coords(c) => box = box.tighten(c, Long.MinValue, v - 1L); true
      case LessThanOrEqual(c, v: Long) if coords(c) => box = box.tighten(c, Long.MinValue, v); true
      case LessThanOrEqual(c, v: Int) if coords(c) => box = box.tighten(c, Long.MinValue, v); true
      case _ => false
    }
    // everything stays residual: Spark re-applies all predicates above
    // the scan, so pruning is purely an I/O optimization and never a
    // correctness dependency
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Zarr3VoxelScan(path, box, required)
}

final class Zarr3VoxelScan(path: String, box: Zarr3VoxelSource.Box, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"zarr3voxels($path) box=$box cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val (shape, shard, chunk) = Zarr3VoxelSource.levelGeometry(conf, path)
    // one listStatus walk collects the existing shard keys
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(conf)
    // qualify so key parsing below sees the same scheme/authority as the
    // listed children (load("/tmp/x") vs listed "file:/tmp/x/...")
    val base = fs.makeQualified(new Path(path))
    val existing = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else {
        // c/<t>/<c>/<z>/<y>/<x>
        val rel = st.getPath.toString.stripPrefix(base.toString).stripPrefix("/")
        val parts = rel.split('/')
        // tolerate stray files (partial writes, editor temps): only
        // all-numeric c/<t>/<c>/<z>/<y>/<x> keys are shard files
        if (parts.length == 6 && parts(0) == "c" &&
            parts.drop(1).forall(p => p.nonEmpty && p.forall(_.isDigit)))
          existing += ((parts(3).toLong, parts(4).toLong, parts(5).toLong))
      }
    }
    if (fs.exists(new Path(base, "c"))) walk(new Path(base, "c"))
    val serConf = new SerializableConfiguration(conf)
    val parts = Seq.newBuilder[InputPartition]
    var gz = 0L
    while (gz * shard.z < shape.z) {
      var gy = 0L
      while (gy * shard.y < shape.y) {
        var gx = 0L
        while (gx * shard.x < shape.x) {
          val s0z = gz * shard.z; val s0y = gy * shard.y; val s0x = gx * shard.x
          val dShape = Shape3(
            math.min(shard.z, shape.z - s0z),
            math.min(shard.y, shape.y - s0y),
            math.min(shard.x, shape.x - s0x))
          val overlaps =
            s0z <= box.z1 && s0z + dShape.z - 1 >= box.z0 &&
              s0y <= box.y1 && s0y + dShape.y - 1 >= box.y0 &&
              s0x <= box.x1 && s0x + dShape.x - 1 >= box.x0
          if (overlaps && existing((gz, gy, gx)))
            parts += Zarr3VoxelPartition(
              s"$path/${ZarrV3.shardKey(gz, gy, gx)}", s0z, s0y, s0x,
              dShape, shard, chunk, box, required.fieldNames, serConf)
          gx += 1
        }
        gy += 1
      }
      gz += 1
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new Zarr3VoxelReader(p.asInstanceOf[Zarr3VoxelPartition])
}

final case class Zarr3VoxelPartition(
    shardPath: String, s0z: Long, s0y: Long, s0x: Long,
    dataShape: Shape3, shard: Shape3, chunk: Shape3,
    box: Zarr3VoxelSource.Box, cols: Array[String],
    serConf: SerializableConfiguration) extends InputPartition

/** Decodes one shard and iterates its voxels clipped to the pushed box. */
final class Zarr3VoxelReader(p: Zarr3VoxelPartition) extends PartitionReader[InternalRow] {
  private val data = ZarrV3.decodeShard(
    ZarrV3.read(p.serConf.value, p.shardPath), p.dataShape, p.shard, p.chunk)
  // column dispatch precomputed ONCE (codes) and one reused row — the
  // inner loop runs per voxel (134M times on a 512^3 shard); per-voxel
  // string matching and row allocation would dominate the scan
  private val colCodes: Array[Int] = p.cols.map {
    case "z" => 0; case "y" => 1; case "x" => 2; case "v" => 3
    case other => sys.error(s"unknown voxel column: $other")
  }
  private val row = new GenericInternalRow(p.cols.length)
  private val zLo = math.max(0L, p.box.z0 - p.s0z)
  private val zHi = math.min(p.dataShape.z - 1, p.box.z1 - p.s0z)
  private val yLo = math.max(0L, p.box.y0 - p.s0y)
  private val yHi = math.min(p.dataShape.y - 1, p.box.y1 - p.s0y)
  private val xLo = math.max(0L, p.box.x0 - p.s0x)
  private val xHi = math.min(p.dataShape.x - 1, p.box.x1 - p.s0x)
  private var z = zLo; private var y = yLo; private var x = xLo - 1

  override def next(): Boolean = {
    x += 1
    if (x > xHi) { x = xLo; y += 1 }
    if (y > yHi) { y = yLo; z += 1 }
    z <= zHi && zLo <= zHi && yLo <= yHi && xLo <= xHi
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < colCodes.length) {
      colCodes(i) match {
        case 0 => row.setLong(i, p.s0z + z)
        case 1 => row.setLong(i, p.s0y + y)
        case 2 => row.setLong(i, p.s0x + x)
        case _ => row.setInt(i,
          data(((z * p.dataShape.y + y) * p.dataShape.x + x).toInt) & 0xffff)
      }
      i += 1
    }
    row
  }

  override def close(): Unit = ()
}
