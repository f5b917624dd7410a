package graft.etl

import graft.{Tables, TestSpark}
import graft.index.ShardIndex
import graft.sources.BinaryFiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("A6 observe: docs + missing-key counters collected with the job") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .withColumn("key", when(col("doc_id") < 10, lit(null)).otherwise(col("doc_id")))
    val observed = Metrics.observeDocs(docs, "load", "key")
    val m = Metrics.run(observed, "load")
    assert(m("docs") === 500L)
    assert(m("missing_key") === 10L)
  }

  test("M2/M3 optimize compacts to one file per shard; commit meta readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opt_in_").toString
    val docs = Tables.lineitem(spark, TestSpark.sf).limit(2000)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
    ShardIndex.write(docs, "id", dir, shards = 2)
    assert(ShardIndex.commitMeta(dir).exists(_.contains("\"shards\":2")))
    val out = java.nio.file.Files.createTempDirectory("graft_opt_out_").toString
    ShardIndex.optimize(spark, dir, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(files.length === 2)
    files.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName} has ${parts.length} files")
    }
    assert(spark.read.parquet(out).count() === spark.read.parquet(dir).count())
    // commit meta carried forward; re-optimize refuses the committed
    // target without overwrite=true
    assert(ShardIndex.commitMeta(out).exists(_.contains("\"shards\":2")))
    intercept[IllegalStateException](ShardIndex.optimize(spark, dir, out))
    ShardIndex.optimize(spark, dir, out, overwrite = true)
    assert(spark.read.parquet(out).count() === spark.read.parquet(dir).count())
  }

  test("optimize keeps write()'s dir padding and id-desc sort at >= 10 shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opt12_in_").toString
    val docs = Tables.lineitem(spark, TestSpark.sf).limit(3000)
      .withColumn("id", concat(col("l_orderkey"), lit("#"), col("l_linenumber")))
    ShardIndex.write(docs, "id", dir, shards = 12)
    val out = java.nio.file.Files.createTempDirectory("graft_opt12_out_").toString
    ShardIndex.optimize(spark, dir, out)
    // padded shard=000NN dirs — positional go-live mapping stays
    // correct past shard 9 (unpadded shard=10 sorts before shard=2)
    val dirs = graft.index.GoLive.shardDirs(out).map(_._2.split('/').last)
    assert(dirs === (0 until 12).map(i => f"shard=$i%05d"))
    // within-shard id-desc order re-established from the commit marker
    val shard0 = spark.read.parquet(s"$out/shard=00000")
      .select("id").collect().map(_.getString(0)).toSeq
    assert(shard0 === shard0.sorted.reverse)
  }

  test("multimodal decode stub: per-partition batched, deterministic features") {
    val assets = graft.ops.Multimodal.readBinary(spark, TestSpark.sf, "*.parquet")
    val decoded = graft.ops.Multimodal.decodeImages(spark, assets).collect()
    assert(decoded.length === 10) // one per table file
    decoded.foreach { d =>
      assert(d.width >= 64 && d.height >= 64 && d.channels === 3)
      assert(d.features.length === 8)
    }
    // deterministic: same bytes -> same features
    val again = graft.ops.Multimodal.decodeImages(spark, assets).collect()
    assert(decoded.map(_.features.toSeq).toSet === again.map(_.features.toSeq).toSet)
  }

  test("resize plan: aspect preserved, capped, never upscaled") {
    import spark.implicits._
    val df = Seq((1, 2048, 1024), (2, 100, 50), (3, 512, 512)).toDF("id", "w", "h")
    val got = graft.ops.Multimodal.resizePlan(df, "w", "h", maxDim = 512)
      .select("id", "target_width", "target_height")
      .as[(Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1) === ((512, 256)))  // downscaled, aspect kept
    assert(got(2) === ((100, 50)))   // small image untouched
    assert(got(3) === ((512, 512)))  // exactly at cap
  }

  test("S2 manifest source reads exactly the listed files") {
    val manifest = java.nio.file.Files.createTempFile("graft_manifest_", ".txt")
    java.nio.file.Files.writeString(manifest,
      s"${TestSpark.sf}/region.parquet\n\n# comment\n${TestSpark.sf}/nation.parquet\n")
    val df = BinaryFiles.readManifest(spark, manifest.toString)
    val names = df.select("path").collect().map(_.getString(0)).toSet
    assert(names.size === 2)
    assert(names.forall(n => n.endsWith("region.parquet") || n.endsWith("nation.parquet")))
  }

  test("S1 tree scan skips nothing visible, hidden files excluded by Spark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tree_").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "x")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir, "sub"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "sub", "b.txt"), "y")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_hidden.txt"), "z")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, ".dot.txt"), "z")
    val got = BinaryFiles.readTree(spark, dir).select("path").collect()
      .map(_.getString(0).split('/').last).toSet
    assert(got === Set("a.txt", "b.txt"))
  }
}
