package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BackupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore(): String = {
    val out = java.nio.file.Files.createTempDirectory("graft_bk_src_").toString
    SegmentShardSink.write(
      (1 to 40).map(i => (i.toString, s"val$i", i.toLong)).toDF("id", "v", "n"),
      "id", out, shards = 2)
    out
  }

  test("backup + restore round trip preserves every row") {
    val store = newStore()
    val dst = java.nio.file.Files.createTempDirectory("graft_bk_dst_").toString
    val snap = Backup.backup(spark, store, dst, "t1")
    assert(snap.endsWith("snapshot.t1"))
    Backup.restore(spark, snap, s"$dst/restored")
    val a = spark.read.format("graft-index").load(store)
      .orderBy("id").collect().toSeq
    val b = spark.read.format("graft-index").load(s"$dst/restored")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("snapshots are immutable — second backup under the same name fails") {
    val store = newStore()
    val dst = java.nio.file.Files.createTempDirectory("graft_bk_dst_").toString
    Backup.backup(spark, store, dst, "x")
    val e = intercept[IllegalArgumentException](Backup.backup(spark, store, dst, "x"))
    assert(e.getMessage.contains("already exists"))
  }

  test("restore refuses an incomplete snapshot (no marker) and a live destination") {
    val store = newStore()
    val dst = java.nio.file.Files.createTempDirectory("graft_bk_dst_").toString
    val snap = Backup.backup(spark, store, dst, "y")
    // restoring ONTO an existing store must fail, not merge
    val e1 = intercept[IllegalArgumentException](Backup.restore(spark, snap, store))
    assert(e1.getMessage.contains("already a store"))
    // a snapshot with the marker deleted is recognizably incomplete
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(snap, "_graft_segment_commit.json"))
    val e2 = intercept[IllegalArgumentException](
      Backup.restore(spark, snap, s"$dst/r2"))
    assert(e2.getMessage.contains("not a complete snapshot"))
  }

  test("listBackups reports each snapshot with file counts and bytes") {
    val store = newStore()
    val dst = java.nio.file.Files.createTempDirectory("graft_bk_dst_").toString
    Backup.backup(spark, store, dst, "a")
    Backup.backup(spark, store, dst, "b")
    val ls = Backup.listBackups(spark, dst)
    assert(ls.map(_._1) === Seq("a", "b"))
    assert(ls.forall(e => e._2 > 0 && e._3 > 0))
    assert(Backup.listBackups(spark, s"$dst/nope") === Nil)
  }
}
