package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Graph traversal over edge frames — the Solr streaming-expression
 * graph family beyond one-hop `nodes()`/`gatherNodes()` (q107/q198):
 * `shortestPath(collection, from=, to=, edge=, maxDepth=)`, which BFS-
 * walks the edge set a round at a time and emits EVERY minimum-length
 * path (Solr's ShortestPathStream contract: breadth-first join rounds
 * against the index, depth-bounded).
 *
 * Spark-first shape: one equi-join shuffle per BFS round (frontier ⋈
 * edges on the from-key) plus an ids-only anti-join against the
 * visited set; the frontier is `localCheckpoint`ed each round (the
 * BPE-loop lineage discipline) so plan depth stays O(1) per round
 * rather than O(depth). Path arrays ride the frontier — safe because
 * every min-depth path visits each node at its BFS depth (a walk that
 * revisits, or visits later than first reach, is strictly longer), so
 * pruning previously-visited nodes preserves the full answer set.
 * Work per round ∝ frontier × mean out-degree; maxDepth bounds the
 * whole traversal, exactly as Solr requires of the request.
 *
 * The default strategy is BIDIRECTIONAL (meet-in-the-middle): a
 * forward BFS from the source and a backward BFS from the target over
 * reversed edges, expanding the smaller frontier each round. For a
 * branching factor b and distance L this probes O(2·b^(L/2)) edges
 * instead of O(b^L) — at corpus scale the unidirectional frontier's
 * last layer alone dwarfs both bidirectional searches combined.
 *
 * Result-set identity proof (all-min-paths contract): let L be the
 * true distance. (1) First detection is at fDepth+bDepth = L: a meet
 * node at (fDepth, bDepth) implies a path of that length, so no meet
 * can exist while fDepth+bDepth < L; conversely every shortest path's
 * node at distance fDepth from the source is at distance L−fDepth
 * from the target, so once fDepth+bDepth = L the meet layer is
 * non-empty — and since each round grows fDepth+bDepth by exactly 1,
 * the walk cannot step over L, regardless of which side expands.
 * (2) Completeness/exactness of the emitted set: each frontier
 * carries ALL minimum-length path halves to each of its nodes (same
 * induction as the unidirectional walk — visited-pruning only drops
 * strictly longer walks). A shortest path crosses the meet layer at
 * exactly one node (its node at distance fDepth), so splicing every
 * (forward half × backward half) pair at each meet node enumerates
 * every shortest path exactly once.
 */
object GraphOps {

  /**
   * All shortest paths `source` → `target` over directed edges.
   * Output: (path, depth) — `path` = nodes joined with '>', one row
   * per distinct minimum-length path; empty frame if unreachable
   * within `maxDepth`. Edges are distinct-ed on (from, to) so path
   * multiplicity mirrors the graph, not the edge list's duplication.
   * `bidirectional = false` forces the plain forward walk (kept for
   * A/B verification; results are identical).
   *
   * `assumeDistinct = true` skips the defensive (from, to) distinct —
   * pass it when the edge frame is distinct by construction (e.g.
   * unioned frames with disjoint key namespaces, each internally
   * deduped on its natural numeric key). The distinct is a full
   * shuffle of the edge set and routinely dominates the whole walk,
   * so callers that can prove uniqueness cheaply should.
   */
  def shortestPaths(edges: DataFrame, fromCol: Column, toCol: Column,
                    source: String, target: String, maxDepth: Int,
                    bidirectional: Boolean = true,
                    assumeDistinct: Boolean = false): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 12, s"maxDepth out of range: $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._
    // the edge frame is probed once per BFS round — persist it for
    // the loop so the source scan + distinct run once, not per round
    // (at corpus scale this is the difference between O(depth) and
    // O(1) passes over the fact table)
    val projected = edges.select(fromCol.cast("string").as("__src"),
      toCol.cast("string").as("__dst"))
    val e = (if (assumeDistinct) projected else projected.distinct()).persist()
    try {
      if (source == target) return Seq((source, 0L)).toDF("path", "depth")
      if (bidirectional) bidi(e, source, target, maxDepth)
      else forwardOnly(e, source, target, maxDepth)
    } finally e.unpersist(blocking = false)
  }

  private def forwardOnly(e: DataFrame, source: String, target: String,
                          maxDepth: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("path", "depth")
    var frontier = Seq((source, Seq(source))).toDF("node", "path")
    var visited = Seq(source).toDF("node")
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("__dst").as("node"),
          concat(col("path"), array(col("__dst"))).as("path"))
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      // one probe job per round, not two: total and target hits from
      // a single aggregate over the just-checkpointed frontier (each
      // extra action is a full job launch — at 4 rounds the fused
      // probe saves a third of the loop's fixed overhead)
      val probe = next.agg(count(lit(1)).as("n"),
        count(when(col("node") === target, 1)).as("hits")).head()
      if (probe.getLong(1) > 0)
        return next.filter(col("node") === target)
          .select(array_join(col("path"), ">").as("path"),
            lit(depth.toLong).as("depth"))
      if (probe.getLong(0) == 0) return empty
      if (depth < maxDepth) { // final round never consumes visited
        visited = visited.union(next.select(col("node")).distinct())
          .localCheckpoint(true)
        frontier = next
      }
    }
    empty
  }

  /** Meet-in-the-middle walk. Forward frontiers carry (node, path
    * source→node); backward frontiers carry (node, bpath node→target).
    * After every single-side expansion the two frontiers are joined on
    * node; the first non-empty meet layer is the answer. */
  private def bidi(e: DataFrame, source: String, target: String,
                   maxDepth: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("path", "depth")
    // reversed edge view for the backward walk — same persisted frame,
    // columns swapped (no second scan, no second shuffle cache)
    val er = e.select(col("__dst").as("__src"), col("__src").as("__dst"))
    var fFront = Seq((source, Seq(source))).toDF("node", "path")
    var bFront = Seq((target, Seq(target))).toDF("node", "bpath")
    var fVisited = Seq(source).toDF("node")
    var bVisited = Seq(target).toDF("node")
    var fDepth = 0
    var bDepth = 0
    // expansion cost ∝ frontier size: track counts to grow the small side
    var fCount = 1L
    var bCount = 1L
    while (fDepth + bDepth < maxDepth) {
      val growForward = fCount <= bCount
      if (growForward) {
        fDepth += 1
        fFront = fFront.join(e, fFront("node") === e("__src"))
          .select(col("__dst").as("node"),
            concat(col("path"), array(col("__dst"))).as("path"))
          .join(fVisited, Seq("node"), "left_anti")
          .localCheckpoint(true)
      } else {
        bDepth += 1
        bFront = bFront.join(er, bFront("node") === er("__src"))
          .select(col("__dst").as("node"),
            concat(array(col("__dst")), col("bpath")).as("bpath"))
          .join(bVisited, Seq("node"), "left_anti")
          .localCheckpoint(true)
      }
      // meet layer: every shortest path of length fDepth+bDepth crosses
      // here (scaladoc proof) — splice forward × backward halves. The
      // meet frame stays DISTRIBUTED (it is the operator's result and
      // can be as large as the all-shortest-paths set); the emptiness
      // probe reads one partition of the checkpoint, not the driver
      val meets = fFront.join(bFront, Seq("node"))
        .select(array_join(
            concat(col("path"),
              expr("slice(bpath, 2, greatest(size(bpath) - 1, 0))")),
            ">").as("path"),
          lit((fDepth + bDepth).toLong).as("depth"))
        .localCheckpoint(true)
      if (meets.limit(1).count() > 0) return meets
      val grown = if (growForward) fFront else bFront
      val n = grown.count()
      if (n == 0) return empty
      if (growForward) {
        fCount = n
        if (fDepth + bDepth < maxDepth) // final round never consumes visited
          fVisited = fVisited.union(fFront.select(col("node")).distinct())
            .localCheckpoint(true)
      } else {
        bCount = n
        if (fDepth + bDepth < maxDepth)
          bVisited = bVisited.union(bFront.select(col("node")).distinct())
            .localCheckpoint(true)
      }
    }
    empty
  }
}
