package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DirSync

class DirSyncSpec extends AnyFunSuite {

  test("recursive copy with overwrite (W10 derivatives sync)") {
    val src = Files.createTempDirectory("sync_src")
    val dst = Files.createTempDirectory("sync_dst")
    Files.writeString(src.resolve("a.json"), """{"x":1}""")
    Files.createDirectories(src.resolve("nested"))
    Files.writeString(src.resolve("nested/b.txt"), "hello")

    val conf = new Configuration()
    val n1 = DirSync.sync(conf, src.toString, dst.toString)
    assert(n1 == 2)
    assert(Files.readString(dst.resolve("a.json")) == """{"x":1}""")
    assert(Files.readString(dst.resolve("nested/b.txt")) == "hello")

    // idempotent overwrite picks up changed content
    Files.writeString(src.resolve("a.json"), """{"x":2}""")
    val n2 = DirSync.sync(conf, src.toString, dst.toString)
    assert(n2 == 2)
    assert(Files.readString(dst.resolve("a.json")) == """{"x":2}""")

    intercept[IllegalArgumentException] {
      DirSync.sync(conf, Paths.get(src.toString, "missing").toString, dst.toString)
    }
  }
}
