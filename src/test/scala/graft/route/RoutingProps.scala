package graft.route

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests over the pure-JVM routing core (sbt runs ScalaCheck
  * Properties natively alongside the ScalaTest suites). */
object RoutingProps extends Properties("routing") {

  property("utf8 hash path == string hash path, any unicode string") =
    forAll { (s: String) =>
      SolrHash.hashUtf8(UTF8String.fromString(s)) == SolrHash.hashString(s)
    }

  property("composite fast path == slow path, any unicode string") =
    forAll { (s: String) =>
      SolrHash.compositeHashUtf8(UTF8String.fromString(s)) == SolrHash.compositeHash(s)
    }

  property("bang-free ids: composite == plain hash") =
    forAll(Gen.asciiPrintableStr.suchThat(!_.contains('!'))) { s =>
      SolrHash.compositeHash(s) == SolrHash.hashString(s)
    }

  property("two-part composite: top 16 bits from prefix, bottom 16 from rest") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      SolrHash.compositeHash(s"$a!$b") ==
        ((SolrHash.hashString(a) & 0xffff0000) | (SolrHash.hashString(b) & 0x0000ffff))
    }

  private val shardCounts = Gen.chooseNum(1, 200)

  property("every hash falls in exactly one range; binary search agrees with linear scan") =
    forAll(shardCounts, Gen.chooseNum(Int.MinValue, Int.MaxValue)) { (n, h) =>
      val r = HashRangeRouter(n)
      val covering = r.starts.indices.filter(i => r.starts(i) <= h && h <= r.ends(i))
      covering.size == 1 && r.shardOfHash(h) == covering.head
    }

  property("ranges tile the space contiguously") =
    forAll(shardCounts) { n =>
      val r = HashRangeRouter(n)
      r.starts.head == Int.MinValue && r.ends.last == Int.MaxValue &&
        (1 until n).forall(i => r.starts(i).toLong == r.ends(i - 1).toLong + 1)
    }

  property("microShard in [0, P) and contiguous within its root shard") =
    forAll(Gen.chooseNum(1, 32), Gen.chooseNum(1, 8), Gen.alphaNumStr) { (shards, per, id) =>
      val r = HashRangeRouter(shards)
      val p = shards * per
      val m = r.microShard(id, p)
      m >= 0 && m < p && m / per == r.shardOfId(id)
    }

  property("shard assignment is deterministic across router instances") =
    forAll(shardCounts, Gen.alphaNumStr) { (n, id) =>
      HashRangeRouter(n).shardOfId(id) == HashRangeRouter(n).shardOfId(id)
    }
}
