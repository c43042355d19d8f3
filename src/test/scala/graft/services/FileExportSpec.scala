package graft.services

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class FileExportSpec extends SparkTestBase {
  import spark.implicits._

  test("copyAll executes the manifest partition-parallel") {
    val srcDir = Paths.get(scratch("fe-src"))
    val dstDir = Paths.get(scratch("fe-dst"))
    Files.createDirectories(srcDir)
    val manifest = (1 to 5).map { i =>
      val f = srcDir.resolve(s"part-$i.txt")
      Files.write(f, s"content-$i".getBytes("UTF-8"))
      (f.toString, dstDir.resolve(s"renamed/export_$i.txt").toString)
    }.toDF("src", "dest")
    val n = FileExport.copyAll(manifest)
    assert(n === 5)
    (1 to 5).foreach { i =>
      val f = dstDir.resolve(s"renamed/export_$i.txt")
      assert(Files.exists(f))
      assert(new String(Files.readAllBytes(f), "UTF-8") === s"content-$i")
    }
  }
}
