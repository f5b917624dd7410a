package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ManifestDistributedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("distributed manifest read matches the driver-side flow, no driver collect") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_files_")
    val contents = Map("a.bin" -> "alpha".getBytes("UTF-8"),
      "b.bin" -> Array.fill(1000)(7.toByte),
      "c.bin" -> Array[Byte]())
    contents.foreach { case (n, b) =>
      java.nio.file.Files.write(dir.resolve(n), b)
    }
    val manifest = dir.resolve("list.txt")
    java.nio.file.Files.writeString(manifest,
      contents.keys.toSeq.sorted.map(n => s"$dir/$n").mkString(
        "# comment line\n\n", "\n", "\n"))

    val got = BinaryFiles.readManifestDistributed(spark, manifest.toString)
      .collect().map(r => (r.getString(0).split('/').last,
        r.getLong(1), r.getAs[Array[Byte]](2).toSeq, r.getBoolean(3))).toSeq
      .sortBy(_._1)
    assert(got.map(_._1) === Seq("a.bin", "b.bin", "c.bin"))
    got.foreach { case (name, len, bytes, truncated) =>
      assert(bytes === contents(name).toSeq, name)
      assert(len === contents(name).length.toLong)
      assert(!truncated)
    }
  }

  test("oversize files truncate at maxBytes and are flagged, not fatal") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_big_")
    java.nio.file.Files.write(dir.resolve("big.bin"), Array.fill(4096)(1.toByte))
    val manifest = dir.resolve("list.txt")
    java.nio.file.Files.writeString(manifest, s"$dir/big.bin\n")
    val r = BinaryFiles.readManifestDistributed(spark, manifest.toString,
      maxBytes = 1024).collect().head
    assert(r.getLong(1) === 4096L)
    assert(r.getAs[Array[Byte]](2).length === 1024)
    assert(r.getBoolean(3))
  }
}
