package graft.route

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashRangeRouterSpec extends AnyFunSuite {

  test("ranges tile the full 32-bit space contiguously, any shard count") {
    for (n <- Seq(1, 2, 3, 4, 5, 7, 16, 100, 1000)) {
      val r = HashRangeRouter(n)
      assert(r.starts.length === n)
      assert(r.starts.head === Int.MinValue)
      assert(r.ends.last === Int.MaxValue)
      for (i <- 1 until n) {
        assert(r.starts(i) === r.ends(i - 1) + 1, s"gap at $i for $n shards")
        assert(r.starts(i) > r.starts(i - 1), s"order at $i for $n shards")
      }
    }
  }

  test("power-of-two shard counts give exact equal ranges") {
    val r = HashRangeRouter(4)
    assert(r.starts.toSeq === Seq(Int.MinValue, 0xc0000000, 0, 0x40000000))
    assert(r.ends.toSeq === Seq(0xbfffffff, -1, 0x3fffffff, Int.MaxValue))
    // 8-shard layout pinned too: the DuckDbMurmurSql routing oracles
    // (q49/q50) embed these starts as literals in the driver's SQL
    assert(HashRangeRouter(8).starts.toSeq === Seq(Int.MinValue,
      0xa0000000, 0xc0000000, 0xe0000000, 0, 0x20000000, 0x40000000,
      0x60000000))
  }

  test("non-power-of-two range ends rounded to 0x...ffff (CompositeIdRouter rounding)") {
    val r = HashRangeRouter(3)
    // all non-final ends land on a 16-bit sub-domain boundary
    for (i <- 0 until 2) assert((r.ends(i) & 0xffff) === 0xffff, s"end $i")
  }

  test("shardOfHash == linear scan over ranges") {
    for (n <- Seq(1, 3, 4, 7, 16)) {
      val r = HashRangeRouter(n)
      val probes = Seq(Int.MinValue, Int.MinValue + 1, -1, 0, 1, Int.MaxValue,
        Int.MaxValue - 1) ++ r.starts.toSeq ++ r.ends.toSeq
      for (hsh <- probes) {
        val linear = r.starts.indices.filter(i => r.starts(i) <= hsh && hsh <= r.ends(i))
        assert(linear.size === 1, s"hash $hsh covered once for $n shards")
        assert(r.shardOfHash(hsh) === linear.head, s"hash $hsh, $n shards")
      }
    }
  }

  test("microShard: reference formula (slice by composite hash, offset by full-key murmur3)") {
    val r = HashRangeRouter(4)
    for (id <- Seq("a", "doc-17", "42#3", "tenant!x")) {
      val route = SolrHash.compositeHash(id)
      // hand-computed reference math, SolrCloudCompositeIdRoutingPartitioner.java:92-96:
      // offset term hashes the FULL key string with plain murmur3
      val offsetHash = SolrHash.hashString(id)
      val micro = r.microShard(id, 8)
      assert(micro === r.shardOfHash(route) * 2 + (offsetHash & Int.MaxValue) % 2)
      assert(micro >= 0 && micro < 8)
      // micro shards of a root shard are contiguous (mtree merge layout)
      assert(micro / 2 === r.shardOfHash(route))
    }
    intercept[IllegalArgumentException](r.microShard("a", 9))
  }

  test("composite-id micro shard: offset from full key, NOT the composite hash") {
    // golden check that composite ids where the two hashes pick
    // different offsets follow the full-key one (the round-1/2 bug
    // derived the offset from compositeHash)
    val r = HashRangeRouter(2)
    val perShard = 8
    val ids = (0 until 200).map(i => s"tenant$i!doc$i")
    val diverging = ids.filter { id =>
      (SolrHash.compositeHash(id) & Int.MaxValue) % perShard !=
        (SolrHash.hashString(id) & Int.MaxValue) % perShard
    }
    assert(diverging.size > 50, "test corpus should exercise divergent offsets")
    diverging.foreach { id =>
      val micro = r.microShard(id, 2 * perShard)
      assert(micro % perShard === (SolrHash.hashString(id) & Int.MaxValue) % perShard, id)
      assert(micro / perShard === r.shardOfHash(SolrHash.compositeHash(id)), id)
    }
  }

  test("explicit (non-uniform) ranges: injection routes by the live collection's slices") {
    // a 3-shard collection after splitting shard 0 of a 2-shard one
    val ranges = Seq((Int.MinValue, -0x40000001), (-0x40000000, -1), (0, Int.MaxValue))
    val r = HashRangeRouter.fromRanges(ranges)
    assert(r.numShards === 3)
    assert(r.shardOfHash(Int.MinValue) === 0)
    assert(r.shardOfHash(-0x40000001) === 0)
    assert(r.shardOfHash(-0x40000000) === 1)
    assert(r.shardOfHash(-1) === 1)
    assert(r.shardOfHash(0) === 2)
    assert(r.shardOfHash(Int.MaxValue) === 2)
    // invalid injections rejected
    intercept[IllegalArgumentException](
      HashRangeRouter.fromRanges(Seq((Int.MinValue, 5), (7, Int.MaxValue)))) // gap
    intercept[IllegalArgumentException](
      HashRangeRouter.fromRanges(Seq((Int.MinValue, 5), (6, 100)))) // not full space
  }

  test("shard expression (codegen) agrees with driver-side routing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = HashRangeRouter(5)
    val ids = (0 until 2000).map(i => s"doc-$i")
    val got = ids.toDF("id")
      .select(col("id"), r.shardCol(col("id")).as("shard"),
        r.microShardCol(col("id"), 10).as("micro"))
      .collect()
      .map(row => row.getString(0) -> ((row.getInt(1), row.getInt(2)))).toMap
    ids.foreach { id =>
      assert(got(id) === ((r.shardOfId(id), r.microShard(id, 10))), id)
    }
  }

  test("distribution is roughly even (SolrCloudCompositeIdRoutingPartitionerTest shape)") {
    val r = HashRangeRouter(4)
    val counts = new Array[Int](4)
    (0 until 20000).foreach(i => counts(r.shardOfId(s"id-$i")) += 1)
    counts.foreach(c => assert(c > 3500 && c < 6500, counts.mkString(",")))
  }
}
