package graft.plans

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Directory sync between filesystems (reference W10: the `aws s3 sync`
  * subprocess for `derivatives/`, `utils/utils.py:149-212` — re-expressed
  * as Hadoop FS copies so file:// ↔ s3a:// both work with no subprocess
  * and the same code path in tests and production).
  */
object DirSync {

  /** Recursively copy `srcDir` into `dstDir` (created if absent).
    * Returns the number of files copied. Idempotent overwrite.
    */
  def sync(conf: Configuration, srcDir: String, dstDir: String): Long = {
    val src = new Path(srcDir)
    val dst = new Path(dstDir)
    // raw local FS on both ends: no 512-byte checksum chunking, no .crc
    // sidecars polluting the synced tree (see ZarrV3.rawFs)
    val srcFs: FileSystem = graft.sinks.ZarrV3.rawFs(src, conf)
    val dstFs: FileSystem = graft.sinks.ZarrV3.rawFs(dst, conf)
    require(srcFs.exists(src), s"source does not exist: $srcDir")
    dstFs.mkdirs(dst)
    var copied = 0L
    def walk(s: Path, d: Path): Unit = {
      for (st <- srcFs.listStatus(s)) {
        val target = new Path(d, st.getPath.getName)
        if (st.isDirectory) { dstFs.mkdirs(target); walk(st.getPath, target) }
        else {
          FileUtil.copy(srcFs, st.getPath, dstFs, target,
            /*deleteSource=*/ false, /*overwrite=*/ true, conf)
          copied += 1
        }
      }
    }
    walk(src, dst)
    copied
  }
}
