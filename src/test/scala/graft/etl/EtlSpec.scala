package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F4 generateSequenceKey: per-file counter, existing ids preserved AND not consuming a number") {
    val df = Seq(
      ("f1", 1, None: Option[String]), ("f1", 2, Some("keep-me")), ("f1", 3, None),
      ("f2", 1, None)).toDF("file", "pos", "existing")
    val got = Etl.generateSequenceKey(df, col("file"), col("file"), col("pos"),
        existingId = Some(col("existing")))
      .select("file", "pos", "id").as[(String, Int, String)].collect().toSet
    // the row AFTER keep-me gets #1, not #2 — the reference counter
    // advances only on generation
    assert(got === Set(("f1", 1, "f1#0"), ("f1", 2, "keep-me"),
      ("f1", 3, "f1#1"), ("f2", 1, "f2#0")))
  }

  test("F3 generateUuid: deterministic, RFC-4122 shaped, preserveExisting") {
    val df = Seq(("k1", None: Option[String]), ("k2", Some("pre-set")))
      .toDF("k", "existing")
    val got = Etl.generateUuid(df, "uuid", col("k"), Some(col("existing")))
      .select("k", "uuid").as[(String, String)].collect().toMap
    assert(got("k2") === "pre-set")
    assert(got("k1").matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    // deterministic across runs
    val again = Etl.generateUuid(df, "uuid", col("k"), Some(col("existing")))
      .select("uuid").as[String].collect().toSet
    assert(again === got.values.toSet)
  }

  test("F1 convertTimestamp: multi-format fallback to ISO-8601") {
    val df = Seq("2024-03-05 06:07:08", "2024-03-05", "garbage").toDF("raw")
    val got = Etl.convertTimestamp(df, col("raw"), "iso",
        Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      .select("iso").as[String].collect().toSeq
    assert(got(0) === "2024-03-05T06:07:08Z")
    assert(got(1) === "2024-03-05T00:00:00Z")
    assert(got(2) === null)
  }

  test("F8 alphaNumOrderKey: part-2 < part-10 < part-100 (AlphaNumericComparator)") {
    val df = Seq("part-10", "part-2", "part-100", "part-1", "zeta", "alpha").toDF("n")
    val got = df.orderBy(Etl.alphaNumOrderKey(col("n"))).as[String].collect().toSeq
    assert(got === Seq("alpha", "part-1", "part-2", "part-10", "part-100", "zeta"))
  }

  test("P5 tryRules: first-matching-rule routing; strict throws on residue") {
    val df = Seq(("avro", 1), ("csv", 2), ("avro", 3), ("bin", 4)).toDF("fmt", "v")
    val got = Etl.tryRules(df, Seq(
      (col("fmt") === "avro", (d: org.apache.spark.sql.DataFrame) => d.withColumn("route", lit("A"))),
      (col("fmt") === "csv", (d: org.apache.spark.sql.DataFrame) => d.withColumn("route", lit("C"))),
      (lit(true), (d: org.apache.spark.sql.DataFrame) => d.withColumn("route", lit("rest")))))
    assert(got.select("fmt", "route").as[(String, String)].collect().toSet ===
      Set(("avro", "A"), ("csv", "C"), ("bin", "rest")))
    intercept[IllegalArgumentException] {
      Etl.tryRules(df, Seq((col("fmt") === "avro",
        (d: org.apache.spark.sql.DataFrame) => d)), strictNoMatch = true)
    }
  }

  test("file_* metadata enrichment (HdfsFileFieldNames parity)") {
    val df = Seq(("hdfs://nn:8020/user/x/data.avro", 123L,
      new java.sql.Timestamp(1000000L))).toDF("path", "length", "mtime")
    val got = Etl.withFileMetadata(df, col("path"), col("length"), col("mtime"))
      .select("file_scheme", "file_host", "file_port", "file_path", "file_name", "file_length")
      .collect().head
    assert(got.getString(0) === "hdfs")
    assert(got.getString(1) === "nn")
    assert(got.getString(2) === "8020")
    assert(got.getString(3) === "/user/x/data.avro") // authority stripped
    assert(got.getString(4) === "data.avro")
    assert(got.getLong(5) === 123L)
    // file:/single-slash and bare paths
    val df2 = Seq(("file:/tmp/a.bin", 1L, new java.sql.Timestamp(0)),
      ("/plain/p.bin", 1L, new java.sql.Timestamp(0))).toDF("path", "length", "mtime")
    val paths = Etl.withFileMetadata(df2, col("path"), col("length"), col("mtime"))
      .select("file_path").as[String].collect().toSeq
    assert(paths === Seq("/tmp/a.bin", "/plain/p.bin"))
  }

  test("file_owner/group/permissions enrichment from Hadoop FileStatus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fstat").toFile
    try {
      val f = new java.io.File(dir, "a.bin")
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
      val df = spark.read.format("binaryFile").load(dir.getAbsolutePath).drop("content")
      val got = Etl.withFileStatusMetadata(spark,
        Etl.withFileMetadata(df, col("path"), col("length"), col("modificationTime")))
        .select("file_name", "file_owner", "file_group",
          "file_permissions_user", "file_permissions_group",
          "file_permissions_other", "file_permissions_stickybit")
        .collect().head
      assert(got.getString(0) === "a.bin")
      assert(got.getString(1) != null && got.getString(1).nonEmpty) // e.g. root
      assert(got.getString(2) != null)
      // FsAction symbols: some subset of rwx / "---"
      assert(got.getString(3).matches("[r-][w-][x-]"))
      assert(got.getString(4).matches("[r-][w-][x-]"))
      assert(got.getString(5).matches("[r-][w-][x-]"))
      assert(Set("true", "false").contains(got.getString(6)))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("O1 randomize: deterministic permutation for a fixed seed") {
    val df = (1 to 20).map(_.toString).toDF("v")
    val p1 = Etl.randomize(df).as[String].collect().toSeq
    val p2 = Etl.randomize(df).as[String].collect().toSeq
    assert(p1 === p2)
    assert(p1.sorted === (1 to 20).map(_.toString).sorted)
    assert(p1 !== (1 to 20).map(_.toString)) // actually permuted
  }

  test("P3 addValues appends to multivalued fields, null-safe") {
    val df = Seq((Seq("a"), 1), (null, 2)).toDF("tags", "i")
    val got = Etl.addValues(df, "tags", array(lit("x")))
      .select("tags").as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("a", "x"), Seq("x")))
  }

  test("flattenStructs explodes struct columns into prefixed columns") {
    val df = spark.sql("SELECT 1 AS a, named_struct('x', 2, 'y', 'z') AS s")
    val got = Etl.flattenStructs(df)
    assert(got.columns.toSeq === Seq("a", "s_x", "s_y"))
    assert(got.select("s_x").as[Int].collect().head === 2)
  }
}
