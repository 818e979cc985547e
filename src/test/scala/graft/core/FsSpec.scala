package graft.core

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Race-safety contract of the maintenance-path file swap: a file
 *  appended to the live dir after the rewrite was planned must survive
 *  the swap (the whole-dir replace it replaced would delete it). */
class FsSpec extends AnyFunSuite {

  private def touch(dir: java.nio.file.Path, name: String): java.nio.file.Path =
    java.nio.file.Files.writeString(dir.resolve(name), name)

  test("swapInFiles moves staged files in and deletes only the planned ones") {
    val base = java.nio.file.Files.createTempDirectory("graft_fs")
    val live = java.nio.file.Files.createDirectory(base.resolve("live"))
    val staging = java.nio.file.Files.createDirectory(base.resolve("staging"))
    touch(live, "part-a")
    touch(live, "part-b")
    touch(staging, "part-compacted")
    val conf = new Configuration()
    val planned = Seq(new org.apache.hadoop.fs.Path(live.resolve("part-a").toUri))
    // a concurrent micro-batch lands AFTER planning, BEFORE the swap
    touch(live, "part-concurrent-append")
    Fs.swapInFiles(conf, staging.toString, live.toString, planned)
    val names = new java.io.File(live.toString).listFiles().map(_.getName).toSet
    assert(names === Set("part-b", "part-compacted", "part-concurrent-append"))
  }

  test("swapInFiles tolerates a retry (planned file already gone)") {
    val base = java.nio.file.Files.createTempDirectory("graft_fs2")
    val live = java.nio.file.Files.createDirectory(base.resolve("live"))
    val staging = java.nio.file.Files.createDirectory(base.resolve("staging"))
    touch(staging, "part-x")
    val conf = new Configuration()
    val ghost = Seq(new org.apache.hadoop.fs.Path(live.resolve("never-existed").toUri))
    Fs.swapInFiles(conf, staging.toString, live.toString, ghost)
    val names = new java.io.File(live.toString).listFiles().map(_.getName).toSet
    assert(names === Set("part-x"))
  }
}
