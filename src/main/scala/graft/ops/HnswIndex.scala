package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted SHARDED HNSW index (Malkov & Yashunin 2016) — the graph
 * ANN tier that completes vector-search parity with modern Solr:
 * Solr 9's actual `{!knn}` is Lucene HNSW, one graph PER SHARD with a
 * scatter-gather merge across shards (reference trace: the collection
 * the reference loads into is served exactly that way). This is the
 * same deployment shape Spark-first:
 *
 *  - `build`: hash-repartition the corpus by id into `shards`
 *    partitions, build one in-memory HNSW graph per partition
 *    (mapPartitions — the only imperative per-partition stage in the
 *    family, exactly Lucene's per-segment graph build), and persist
 *    each node's per-layer adjacency as parquet rows partitioned by
 *    shard. Executor memory bounds the SHARD, never the corpus — the
 *    Lucene segment contract.
 *  - `query`: broadcast the (small) query batch, search every shard's
 *    graph independently (one task per shard, graph loaded from its
 *    partition's rows), take each shard's ef-search results and merge
 *    the global top-k with one window — Solr's distributed knn
 *    scatter-gather.
 *
 * DETERMINISM (the property a hash-oracled engine needs, which
 * stochastic HNSW builds lack): node levels come from md5(id) — the
 * engine-wide seeded-randomization primitive (O1/O2) — via the
 * standard geometric assignment floor(-ln(u)·mL), mL = 1/ln(M);
 * insertion order is ascending id within a shard; every candidate
 * ordering breaks ties by (distance, id). Same corpus → bit-identical
 * graph, across builds and across partitionings of the INPUT frame
 * (hash-repartition by id fixes shard membership; per-shard insertion
 * re-sorts).
 *
 * Scale: build is one shuffle (the repartition) + a linear
 * per-partition pass; queries read all shard graphs once (graph size
 * ≈ corpus × M longs — far below raw vectors is NOT true here: HNSW
 * stores raw vectors for distance evaluation, the Lucene trade — use
 * [[IvfPqIndex]] when memory dominates, HNSW when recall-at-low-
 * latency dominates; [[RankingEval.annRecallAtK]] arbitrates).
 */
object HnswIndex {

  private def markerPath(out: String) = s"$out/_hnsw_marker.json"

  final case class Marker(dim: Int, m: Int, efC: Int, shards: Int,
                          idCol: String, vecCol: String)

  /** Uniform(0,1) from md5(id) — the deterministic level source. */
  private def levelOf(id: Long, mL: Double): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(id.toString.getBytes("UTF-8"))
    val bits = java.nio.ByteBuffer.wrap(h).getLong(0) >>> 11 // 53 bits
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0, 1]
    math.floor(-math.log(u) * mL).toInt
  }

  /** One shard's in-memory graph build — insertion in ascending id,
    * every ordering tie-broken by (dist, id). */
  private final class Graph(dim: Int, m: Int, efC: Int) {
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val norms = scala.collection.mutable.ArrayBuffer.empty[Double]
    val levels = scala.collection.mutable.ArrayBuffer.empty[Int]
    // nbrs(node)(layer) = neighbor node indexes
    val nbrs = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Int]]]
    private val mL = 1.0 / math.log(m.toDouble)
    private var entry = -1 // node index of the current top entry point

    /** Restore the entry point on a graph rebuilt from persisted rows:
      * (level desc, id asc) — deterministic, independent of row order. */
    def restoreEntry(): Unit = {
      var best = -1
      var i = 0
      while (i < ids.length) {
        if (best < 0 || levels(i) > levels(best) ||
            (levels(i) == levels(best) && ids(i) < ids(best))) best = i
        i += 1
      }
      entry = best
    }

    /** 1 - cosine (minimized). */
    private def dist(v: Array[Double], n: Double, j: Int): Double = {
      val w = vecs(j)
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * w(i); i += 1 }
      1.0 - s / (n * norms(j))
    }

    /** Best-first layer search: ef closest nodes to v on `layer`,
      * ordered (dist asc, id asc), starting from `starts`. */
    private def searchLayer(v: Array[Double], n: Double, starts: Seq[Int],
                            ef: Int, layer: Int): Seq[(Double, Int)] = {
      val visited = scala.collection.mutable.HashSet.empty[Int]
      // candidates: min-heap by (dist, id); results: max-heap by (dist, id)
      val cand = scala.collection.mutable.PriorityQueue
        .empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Long)](
          t => (-t._1, -ids(t._2))))
      val res = scala.collection.mutable.PriorityQueue
        .empty[(Double, Int)](Ordering.by[(Double, Int), (Double, Long)](
          t => (t._1, ids(t._2))))
      starts.foreach { s0 =>
        if (visited.add(s0)) {
          val d = dist(v, n, s0)
          cand.enqueue((d, s0)); res.enqueue((d, s0))
        }
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        val worst = res.head._1
        if (dc > worst && res.size >= ef) { cand.clear() }
        else {
          val layerNbrs = if (layer < nbrs(c).length) nbrs(c)(layer)
                          else Array.empty[Int]
          layerNbrs.foreach { e =>
            if (visited.add(e)) {
              val d = dist(v, n, e)
              if (res.size < ef || d < res.head._1 ||
                  (d == res.head._1 && ids(e) < ids(res.head._2))) {
                cand.enqueue((d, e)); res.enqueue((d, e))
                if (res.size > ef) res.dequeue()
              }
            }
          }
        }
      }
      res.toSeq.sortBy(t => (t._1, ids(t._2)))
    }

    /** Simple closest-M neighbor selection ((dist, id) order — the
      * deterministic baseline; Lucene defaults to the diversity
      * heuristic, either satisfies the HNSW contract). */
    private def selectM(cands: Seq[(Double, Int)], mm: Int): Array[Int] =
      cands.sortBy(t => (t._1, ids(t._2))).take(mm).map(_._2).toArray

    def insert(id: Long, v: Array[Double]): Unit = {
      val idx = ids.length
      var nrm = 0.0
      var i0 = 0
      while (i0 < dim) { nrm += v(i0) * v(i0); i0 += 1 }
      val n = math.sqrt(nrm)
      val lvl = levelOf(id, mL)
      ids += id; vecs += v; norms += n; levels += lvl
      nbrs += Array.fill(lvl + 1)(Array.empty[Int])
      if (entry < 0) { entry = idx; return }
      var ep = Seq(entry)
      val topL = levels(entry)
      // greedy descent above the node's level
      var layer = topL
      while (layer > lvl) {
        ep = searchLayer(v, n, ep, 1, layer).take(1).map(_._2)
        layer -= 1
      }
      // connect on each layer from min(topL, lvl) down to 0
      layer = math.min(topL, lvl)
      while (layer >= 0) {
        val w = searchLayer(v, n, ep, efC, layer)
        val mm = if (layer == 0) 2 * m else m
        val chosen = selectM(w, mm)
        nbrs(idx)(layer) = chosen
        chosen.foreach { c =>
          val cur = nbrs(c)(layer)
          val withNew = (cur :+ idx).distinct
          nbrs(c)(layer) =
            if (withNew.length <= mm) withNew
            else selectM(withNew.map(j => (dist(vecs(c), norms(c), j), j))
              .toSeq, mm)
        }
        ep = w.map(_._2)
        layer -= 1
      }
      if (lvl > topL) entry = idx
    }

    /** Top-k (cosine desc, id asc) for one query vector. */
    def search(v: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      var nrm = 0.0
      var i0 = 0
      while (i0 < dim) { nrm += v(i0) * v(i0); i0 += 1 }
      val n = math.sqrt(nrm)
      var ep = Seq(entry)
      var layer = levels(entry)
      while (layer > 0) {
        ep = searchLayer(v, n, ep, 1, layer).take(1).map(_._2)
        layer -= 1
      }
      searchLayer(v, n, ep, math.max(ef, k), 0).take(math.max(ef, k))
        .map { case (d, j) => (ids(j), 1.0 - d) }
    }
  }

  /** Build the sharded graph store: one shuffle (hash-repartition by
    * id), one linear graph build per shard, adjacency persisted as
    * parquet partitioned by shard. */
  def build(corpus: DataFrame, out: String, dim: Int, shards: Int = 4,
            m: Int = 8, efConstruction: Int = 64,
            idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.types._
    val rows = corpus.select(col(idCol).cast("long").as("corpus_id"),
        col(vecCol).cast("array<double>").as("cvec"))
      .repartition(shards, col("corpus_id"))
    val schema = StructType(Seq(
      StructField("shard", IntegerType), StructField("corpus_id", LongType),
      StructField("cvec", ArrayType(DoubleType)),
      StructField("level", IntegerType),
      StructField("nbrs", ArrayType(ArrayType(LongType)))))
    val builtRdd = rows.rdd.mapPartitions { it =>
      val part = org.apache.spark.TaskContext.getPartitionId()
      val all = it.map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray)).toArray.sortBy(_._1)
      val g = new Graph(dim, m, efConstruction)
      all.foreach { case (id, v) => g.insert(id, v) }
      g.ids.indices.iterator.map { i =>
        Row(part, g.ids(i), g.vecs(i).toSeq, g.levels(i),
          g.nbrs(i).map(_.map(j => g.ids(j)).toSeq).toSeq)
      }
    }
    spark.createDataFrame(builtRdd, schema)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/graph")
    val mk = s"""{"dim":$dim,"m":$m,"efC":$efConstruction,""" +
      s""""shards":$shards,"idCol":"$idCol","vecCol":"$vecCol"}"""
    val p = new org.apache.hadoop.fs.Path(markerPath(out))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(mk.getBytes("UTF-8")) finally os.close()
  }

  private def readMarker(spark: SparkSession, out: String): Marker = {
    val p = new org.apache.hadoop.fs.Path(markerPath(out))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val txt = new String(buf, "UTF-8")
    def num(k: String) = s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).get.group(1)
    def str(k: String) = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(txt).get.group(1)
    Marker(num("dim").toInt, num("m").toInt, num("efC").toInt,
      num("shards").toInt, str("idCol"), str("vecCol"))
  }

  /** Scatter-gather query: every shard searches its graph for the
    * broadcast query batch (ef results each), one window merges the
    * global top-k — Solr's distributed `{!knn}`. Self-matches are
    * excluded (the family convention). */
  def query(spark: SparkSession, out: String, queries: DataFrame, k: Int,
            efSearch: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val mk = readMarker(spark, out)
    val q = queries.select(col(mk.idCol).cast("long").as("query_id"),
        col(mk.vecCol).cast("array<double>").as("qvec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qB = spark.sparkContext.broadcast(q)
    val dim = mk.dim; val m = mk.m; val efC = mk.efC
    val ef = efSearch; val kk = k
    val graph = spark.read.parquet(s"$out/graph")
      .select("shard", "corpus_id", "cvec", "level", "nbrs")
      .repartition(mk.shards, col("shard"))
    val schema = StructType(Seq(
      StructField("query_id", LongType), StructField("corpus_id", LongType),
      StructField("cosine", DoubleType)))
    val scatteredRdd = graph.rdd.mapPartitions { it =>
      // a task may hold >1 shard after hash partitioning: group, then
      // rebuild each shard's graph verbatim from its persisted rows
      val byShard = it.map { r =>
        (r.getInt(0), (r.getLong(1), r.getSeq[Double](2).toArray,
          r.getInt(3), r.getSeq[scala.collection.Seq[Long]](4).map(_.toArray)))
      }.toArray.groupBy(_._1)
      byShard.iterator.flatMap { case (_, rows0) =>
        val rows = rows0.map(_._2).sortBy(_._1)
        val index = rows.iterator.map(_._1).zipWithIndex.toMap
        val g = new Graph(dim, m, efC)
        rows.foreach { case (id, v, lvl, _) =>
          g.ids += id; g.vecs += v
          var nrm = 0.0
          var i0 = 0
          while (i0 < dim) { nrm += v(i0) * v(i0); i0 += 1 }
          g.norms += math.sqrt(nrm); g.levels += lvl
          g.nbrs += Array.empty
        }
        rows.zipWithIndex.foreach { case ((_, _, _, nb), i) =>
          g.nbrs(i) = nb.map(_.map(index)).toArray
        }
        g.restoreEntry() // (level desc, id asc) — deterministic
        qB.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, kk + 1, ef) // +1 absorbs a self-match
            .filter(_._1 != qid).take(math.max(ef, kk))
            .map { case (cid, cos) => Row(qid, cid, cos) }
        }
      }
    }
    val scattered = spark.createDataFrame(scatteredRdd, schema)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scattered.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

}
