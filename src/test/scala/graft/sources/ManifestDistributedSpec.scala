package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ManifestDistributedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("distributed manifest read matches binaryFile's schema, no driver collect") {
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

    val df = BinaryFiles.readManifestDistributed(spark, manifest.toString)
    // schema parity with binaryFile: the readManifest auto-switch must
    // be invisible to callers
    assert(df.schema.fieldNames.toSeq ===
      Seq("path", "modificationTime", "length", "content"))
    assert(df.schema("modificationTime").dataType.typeName === "timestamp")
    val got = df.collect().map(r => (r.getString(0).split('/').last,
        r.getLong(2), r.getAs[Array[Byte]](3).toSeq)).toSeq
      .sortBy(_._1)
    assert(got.map(_._1) === Seq("a.bin", "b.bin", "c.bin"))
    got.foreach { case (name, len, bytes) =>
      assert(bytes === contents(name).toSeq, name)
      assert(len === contents(name).length.toLong)
    }
  }

  test("oversize files fail fast by default; explicit opt-in truncates") {
    val dir = java.nio.file.Files.createTempDirectory("manifest_big_")
    java.nio.file.Files.write(dir.resolve("big.bin"), Array.fill(4096)(1.toByte))
    val manifest = dir.resolve("list.txt")
    java.nio.file.Files.writeString(manifest, s"$dir/big.bin\n")
    val ex = intercept[org.apache.spark.SparkException] {
      BinaryFiles.readManifestDistributed(spark, manifest.toString,
        maxBytes = 1024).collect()
    }
    assert(ex.getMessage.contains("maxBytes") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxBytes")))
    val r = BinaryFiles.readManifestDistributed(spark, manifest.toString,
      maxBytes = 1024, truncateOversize = true).collect().head
    assert(r.getLong(2) === 4096L) // true length survives the cap
    assert(r.getAs[Array[Byte]](3).length === 1024)
  }
}
