package graft.route

import org.scalatest.funsuite.AnyFunSuite

class ClusterStateSpec extends AnyFunSuite {

  // A post-SPLITSHARD layout: shard1 was split into shard1_0/shard1_1
  // (now inactive parent + two active children), shard2 untouched.
  // Ranges as Solr prints them: unsigned hex, inclusive.
  private val stateJson =
    """{
      |  "mycoll": {
      |    "shards": {
      |      "shard2":   {"range": "0-7fffffff",        "state": "active"},
      |      "shard1":   {"range": "80000000-ffffffff", "state": "inactive"},
      |      "shard1_0": {"range": "80000000-bfffffff", "state": "active"},
      |      "shard1_1": {"range": "c0000000-ffffffff", "state": "active"}
      |    }
      |  }
      |}""".stripMargin

  test("parseSlices: active slices only, sorted by range start") {
    val slices = ClusterState.parseSlices(stateJson, "mycoll")
    assert(slices.map(_.name) === Seq("shard1_0", "shard1_1", "shard2"))
    assert(slices.head.start === Int.MinValue) // 0x80000000
    assert(slices.last.end === Int.MaxValue)   // 0x7fffffff
    // contiguous coverage
    slices.sliding(2).foreach {
      case Seq(a, b) => assert(b.start === a.end + 1)
      case _ =>
    }
  }

  test("routerFor routes with the live (non-uniform) ranges") {
    val router = ClusterState.routerFor(stateJson, "mycoll")
    assert(router.numShards === 3)
    // Uniform 3-shard synthesis would give different boundaries; the
    // live layout splits the negative half at 0xc0000000.
    assert(router.shardOfHash(Int.MinValue) === 0)           // shard1_0
    assert(router.shardOfHash(0xbfffffff) === 0)
    assert(router.shardOfHash(0xc0000000) === 1)             // shard1_1
    assert(router.shardOfHash(-1) === 1)                     // 0xffffffff
    assert(router.shardOfHash(0) === 2)                      // shard2
    assert(router.shardOfHash(Int.MaxValue) === 2)
    // full-id routing goes through the same composite hash as always
    val h = SolrHash.compositeHash("doc-42")
    assert(router.shardOfId("doc-42") === router.shardOfHash(h))
  }

  test("a build routed with the live ranges places docs per the live layout") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val router = ClusterState.routerFor(stateJson, "mycoll")
    val docs = (0 until 200).map(i => (s"doc-$i", s"v$i")).toDF("id", "value")
    val out = java.nio.file.Files.createTempDirectory("graft_cs_build_").toString
    graft.index.ShardIndex.write(docs, "id", out, shards = 3,
      dedupOrder = None, router = Some(router))
    val back = graft.index.ShardIndex.read(spark, out)
      .select("id", "shard").as[(String, String)].collect()
    assert(back.length === 200)
    back.foreach { case (id, shard) =>
      assert(shard.toInt === router.shardOfId(id), s"misrouted $id")
    }
    // non-uniform layout actually exercised: the live ranges differ
    // from uniform 3-shard synthesis for at least one doc
    val uniform = graft.route.HashRangeRouter(3)
    assert((0 until 200).exists(i =>
      uniform.shardOfId(s"doc-$i") != router.shardOfId(s"doc-$i")))
  }

  test("bare shards body and missing collection") {
    val bare = """{"shards": {"s1": {"range": "80000000-7fffffff"}}}"""
    assert(ClusterState.parseSlices(bare, "whatever").head.name === "s1")
    intercept[IllegalArgumentException] {
      ClusterState.parseSlices("""{"other": {}}""", "mycoll")
    }
  }
}
