package graft.route

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/**
 * X1 live-collection alignment without a ZooKeeper client: parse a
 * SolrCloud collection's cluster state JSON (the `state.json` format —
 * public Solr knowledge: `{"<coll>":{"shards":{"<slice>":{"range":
 * "80000000-b332ffff","state":"active",...},...}}}`) into the slice
 * hash ranges, and build a [[HashRangeRouter]] over them. This is the
 * offline analog of the reference's
 * `ZooKeeperInspector.extractDocCollection` + `getSortedSlices`
 * (SolrCloudPartitioner.java:82-96): the reference reads the
 * DocCollection live from ZK; here the caller fetches the JSON by any
 * means (ZK CLI, Collections API CLUSTERSTATUS, a checked-in fixture)
 * and the routing math is identical — so a batch build can align with
 * a collection whose ranges are no longer uniform after SPLITSHARD.
 */
object ClusterState {

  /** One live slice: name + inclusive 32-bit hash range. */
  final case class SliceRange(name: String, start: Int, end: Int)

  /**
   * Parse the active slices of `collection` out of cluster-state JSON,
   * sorted ascending by range start (the order [[HashRangeRouter]]
   * indexes shards in). Accepts both the wrapped form
   * `{"coll":{"shards":...}}` and a bare `{"shards":...}` body.
   * Slices in non-active states (recovery targets of an in-flight
   * split, construction) are skipped, as Solr routes only to active
   * slices covering the hash space.
   */
  def parseSlices(json: String, collection: String): Seq[SliceRange] = {
    val root = new ObjectMapper().readTree(json)
    val coll =
      if (root.has(collection)) root.get(collection)
      else if (root.has("shards")) root
      else throw new IllegalArgumentException(
        s"collection '$collection' not found in cluster state")
    val shards = Option(coll.get("shards")).getOrElse(
      throw new IllegalArgumentException("cluster state has no 'shards' map"))
    shards.properties().asScala.iterator.flatMap { e =>
      val (name, node) = (e.getKey, e.getValue)
      val state = Option(node.get("state")).map(_.asText).getOrElse("active")
      val range = Option(node.get("range")).map(_.asText)
      if (state != "active" || range.isEmpty) None
      else {
        val Array(s, en) = range.get.split("-", 2)
        Some(SliceRange(name,
          java.lang.Integer.parseUnsignedInt(s, 16),
          java.lang.Integer.parseUnsignedInt(en, 16)))
      }
    }.toSeq.sortBy(_.start)
  }

  /**
   * Router aligned with a live collection: slice i of the router = the
   * i-th active slice in range order. Use [[parseSlices]] alongside it
   * when output dirs must carry the live slice NAMES (a split
   * collection's name order — shard1_0, shard1_1 — need not be range
   * order).
   */
  def routerFor(json: String, collection: String,
                routingBits: Int = 16): HashRangeRouter =
    HashRangeRouter.fromRanges(
      parseSlices(json, collection).map(s => (s.start, s.end)), routingBits)
}
