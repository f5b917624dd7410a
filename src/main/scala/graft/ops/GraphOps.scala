package graft.ops

import graft.util.Checkpoints.CutOps
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
    // O(1) passes over the fact table). Persisted PRE-PARTITIONED on
    // the join key (__src): the cached relation advertises its hash
    // partitioning, so every round's frontier⋈edges join exchanges
    // only the (small) frontier — without this, the corpus-sized edge
    // frame reshuffles on every one of the ~maxDepth rounds.
    val projected = edges.select(fromCol.cast("string").as("__src"),
      toCol.cast("string").as("__dst"))
    // ONE exchange builds the cached frame: hash(__src) partitioning
    // satisfies the (__src, __dst) clustering the dedup aggregate
    // needs (partition keys ⊆ grouping keys), so dropDuplicates AFTER
    // the repartition dedups partition-locally with no second shuffle
    // — and the aggregate preserves the hash(__src) layout the
    // per-round joins want
    val part = projected.repartition(col("__src"))
    val e = (if (assumeDistinct) part
             else part.dropDuplicates("__src", "__dst")).persist()
    // reversed view for the backward walk, partitioned on ITS join key
    // (the swap inverts the key, so the forward frame's layout is
    // useless to it — a second cached copy trades memory for zero
    // per-round edge exchanges on both walks)
    val er = e.select(col("__dst").as("__src"), col("__src").as("__dst"))
      .repartition(col("__src")).persist()
    try {
      if (source == target) return Seq((source, 0L)).toDF("path", "depth")
      if (bidirectional) bidi(e, er, source, target, maxDepth)
      else forwardOnly(e, source, target, maxDepth)
    } finally {
      e.unpersist(blocking = false)
      er.unpersist(blocking = false)
    }
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
      // LAZY localCheckpoint: the probe action below is the frontier's
      // first job, so expansion, checkpoint materialization and the
      // probe aggregate all run as ONE Spark job — the eager form paid
      // a separate materialization job per round, and at BFS depth the
      // loop's residual cost IS sequential job launches (the data-sized
      // work is a small-frame join either way). Lineage still truncates
      // at first materialization, so plan depth stays O(1) per round.
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("__dst").as("node"),
          concat(col("path"), array(col("__dst"))).as("path"))
        .join(visited, Seq("node"), "left_anti")
        .cutLineage(false)
      // one probe job per round, not two: total and target hits from
      // a single aggregate over the frontier (each extra action is a
      // full job launch — at 4 rounds the fused probe saves a third of
      // the loop's fixed overhead)
      val probe = next.agg(count(lit(1)).as("n"),
        count(when(col("node") === target, 1)).as("hits")).head()
      if (probe.getLong(1) > 0)
        return next.filter(col("node") === target)
          .select(array_join(col("path"), ">").as("path"),
            lit(depth.toLong).as("depth"))
      if (probe.getLong(0) == 0) return empty
      if (depth < maxDepth) { // final round never consumes visited
        // LAZY visited growth: the union reads already-checkpointed
        // frontier RDDs, so deferring it to the next round's anti-join
        // costs no recompute and saves the eager-checkpoint job that
        // used to run every round. The per-round `distinct` matters:
        // frontier rows are one-per-PATH, and on diamond-shaped graphs
        // the path count per node is combinatorial while the node set
        // is small — the anti-join's build side must stay node-sized.
        // (Distinct per round IS globally distinct: a node already in
        // visited was anti-joined out of `next` and cannot recur.)
        visited = visited.union(next.select(col("node")).distinct())
        frontier = next
      }
    }
    empty
  }

  /** Meet-in-the-middle walk. Forward frontiers carry (node, path
    * source→node); backward frontiers carry (node, bpath node→target).
    * After every single-side expansion the grown frontier is probed
    * against the other side; the first non-empty meet layer is the
    * answer.
    *
    * Round cost is exactly ONE job: the expansion (frontier ⋈ edges,
    * anti-join vs visited) is marked for LAZY localCheckpoint, and the
    * fused probe — frontier size AND meet count against the other
    * frontier in one aggregate — is its first action, so expansion,
    * checkpoint materialization and probe run in a single job launch.
    * The visited set grows as a LAZY union of already-checkpointed
    * frontier id-frames (no recompute, no per-round checkpoint job),
    * and the meet/splice frame is only constructed — lazily — on the
    * terminating round. Sequential job launches are the loop's
    * dominant residual cost once every data-sized movement is a
    * small-frame join; this shape is the floor (one synchronization
    * barrier per BFS layer is inherent to level-synchronous BFS). */
  private def bidi(e: DataFrame, er: DataFrame, source: String,
                   target: String, maxDepth: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("path", "depth")
    var fFront = Seq((source, Seq(source))).toDF("node", "path")
    var bFront = Seq((target, Seq(target))).toDF("node", "bpath")
    var fVisited = Seq(source).toDF("node")
    var bVisited = Seq(target).toDF("node")
    var fDepth = 0
    var bDepth = 0
    // expansion cost ∝ frontier size: track counts to grow the small side
    var fCount = 1L
    var bCount = 1L
    // splice forward × backward halves at their meet nodes (scaladoc
    // proof: every minimum-length path crosses the meet layer at
    // exactly one node, so the product enumerates each exactly once)
    def spliced(ff: DataFrame, bf: DataFrame, depth: Int): DataFrame =
      ff.join(bf, Seq("node"))
        .select(array_join(
            concat(col("path"),
              expr("slice(bpath, 2, greatest(size(bpath) - 1, 0))")),
            ">").as("path"),
          lit(depth.toLong).as("depth"))
    while (fDepth + bDepth < maxDepth) {
      val growForward = fCount <= bCount
      // LAZY localCheckpoint (see forwardOnly): the fused probe below
      // is the frontier's first action, so expansion + checkpoint
      // materialization + probe are ONE job — the round cost drops
      // from two sequential job launches to one
      val next =
        if (growForward) {
          fDepth += 1
          fFront.join(e, fFront("node") === e("__src"))
            .select(col("__dst").as("node"),
              concat(col("path"), array(col("__dst"))).as("path"))
            .join(fVisited, Seq("node"), "left_anti")
            .cutLineage(false)
        } else {
          bDepth += 1
          bFront.join(er, bFront("node") === er("__src"))
            .select(col("__dst").as("node"),
              concat(array(col("__dst")), col("bpath")).as("bpath"))
            .join(bVisited, Seq("node"), "left_anti")
            .cutLineage(false)
        }
      val other = if (growForward) bFront else fFront
      // fused probe: frontier size + meet hits in ONE job. When hits
      // are zero the left join matches nothing, so n is the exact
      // frontier size; when hits > 0 the walk terminates and n's
      // join-multiplied value is never used.
      val probe = next
        .join(other.select(col("node"), lit(1).as("__hit")), Seq("node"), "left")
        .agg(count(lit(1)).as("n"), count(col("__hit")).as("hits")).head()
      if (probe.getLong(1) > 0)
        return if (growForward) spliced(next, bFront, fDepth + bDepth)
               else spliced(fFront, next, fDepth + bDepth)
      if (probe.getLong(0) == 0) return empty
      // LAZY visited growth (see forwardOnly): union over checkpointed
      // frontier ids, node-deduped per round so the anti-join build
      // side stays node-sized on many-paths-per-node graphs
      if (growForward) {
        fCount = probe.getLong(0)
        fVisited = fVisited.union(next.select(col("node")).distinct())
        fFront = next
      } else {
        bCount = probe.getLong(0)
        bVisited = bVisited.union(next.select(col("node")).distinct())
        bFront = next
      }
    }
    empty
  }
}
