package graft.ops

import graft.util.Checkpoints.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Connected components over a pair graph — the clustering step that
 * turns near-duplicate CANDIDATE PAIRS into duplicate GROUPS (keep
 * one representative per component). Pairwise dedup alone
 * under-deletes: if A~B and B~C but A~C was missed, pair-dropping
 * can keep two of the three; component-level dedup keeps exactly one.
 *
 * Algorithm: iterative min-label propagation — every vertex starts
 * labeled with itself, each round takes the min of its own and its
 * neighbors' labels, until no label changes. Converges in
 * graph-diameter rounds; near-dup graphs are unions of small
 * quasi-cliques (diameter ≤ a few), so 3-5 shuffles in practice.
 * Each round is one join + aggregate — fully distributed; the driver
 * only checks the convergence counter. (For adversarial high-diameter
 * graphs the large-star/small-star pointer-jumping variant gets
 * O(log n) rounds; not needed for dedup workloads.)
 */
object Clustering {

  /**
   * (v, label) for every vertex of `edges`, where label = MIN vertex
   * id reachable in the undirected graph — a canonical, deterministic
   * component id. Vertex/label columns are LONG.
   */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    // materialize the edge projection ONCE before symmetrizing: the
    // two union branches are separate subplans to Spark (no cross-
    // branch CSE), so an expensive upstream (e.g. an all-pairs
    // similarity join) would otherwise run twice
    val e = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .cutLineage(false) // lazy: materializes inside the first job that reads it
    // cached PRE-PARTITIONED on b — the key every round's
    // neighbor-join probes — so label propagation exchanges only the
    // vertex-sized label frame per round, never the edge frame; the
    // dedup aggregate rides the same exchange (hash(b) satisfies the
    // (a, b) clustering: partition keys ⊆ grouping keys)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b"))
      .dropDuplicates("a", "b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist) each round: an iterative DataFrame
    // loop grows its LOGICAL plan every iteration — by round ~12 the
    // lineage is deep enough that merely rendering the adaptive plan
    // OOMs. Checkpointing materializes the round AND truncates lineage,
    // so every iteration starts from a flat scan of the previous one.
    // LAZY localCheckpoint throughout the loop (r17 optimization, the
    // GraphOps discipline): the per-round convergence count is the
    // round frame's FIRST action, so propagation, checkpoint
    // materialization and the count run as ONE Spark job instead of
    // two — at CC depth the loop's residual cost is sequential job
    // launches. Lineage still truncates at first materialization.
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("label", col("v"))
      .cutLineage(false)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min label among neighbors, then least(own, neighbors')
      val nbrMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(nbrMin, labels("v") === nbrMin("a"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label") < col("label")).as("__changed"))
        .cutLineage(false)
      changed = next.filter(col("__changed")).count()
      labels = next.select(col("v"), col("label"))
      iter += 1
    }
    // unpersist BEFORE the convergence check: a throw here would
    // otherwise leak the cached edge frame for the session's lifetime
    sym.unpersist(blocking = false)
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
