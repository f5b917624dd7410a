package graft.index

import graft.util.SerializableHadoopConf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/**
 * DataSourceV2 batch reader over a [[SegmentShardSink]] store —
 * `spark.read.format("graft-index").load(store)` — so a built index
 * participates in the engine's relational surface as a TABLE, with
 * Catalyst driving the two optimizations an index can actually serve:
 *
 *  - **exact-term filter pushdown** ([[SupportsPushDownFilters]]): one
 *    `EqualTo(field, value)` predicate is translated to a posting-list
 *    lookup per shard (`SegmentIndex.Reader.termDocs`) instead of a
 *    full stored-doc scan — the index analog of parquet predicate
 *    pushdown, and precisely what Solr does with a `fq=field:term`.
 *    Remaining predicates stay residual Spark filters.
 *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): only
 *    requested stored fields are materialized into rows.
 *
 * Parallelism: one [[InputPartition]] per `part-NNNNN` shard dir — the
 * same task-per-shard shape as [[SegmentSearch]] (and as a Solr
 * distributed query), no shuffle. Schema comes from the store marker's
 * `columns` inventory (metadata-only; no segment open at plan time);
 * every column is `StringType` per the declared strings-only
 * divergence of [[SegmentIndex]]. Multivalued fields surface their
 * FIRST value, matching [[SegmentSearch]].
 *
 * Reference trace: the reference never reads its indexes back into the
 * engine (its product ENDS at the go-live dirs) — this source is the
 * Spark-native closing of that loop, letting downstream pipelines join
 * index contents against anything else the session can read.
 */
class IndexDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-index"

  private def storePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-index requires .load(<store path>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val store = storePath(options)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val cols = SegmentShardSink.storedColumns(conf, store)
    require(cols.nonEmpty,
      s"no column inventory in $store/_graft_segment_commit.json — not a graft segment store?")
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new IndexTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

private[index] class IndexTable(tableSchema: StructType, store: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-index `$store`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // multivalued fields are excluded from pushdown: the relational
    // surface shows their FIRST value, but a posting lookup matches
    // ANY value — pushing would return rows that visibly violate the
    // predicate. Residual Spark evaluation keeps the table honest.
    val mv = SegmentShardSink.readMarker(
      SparkSession.active.sessionState.newHadoopConf(), store).multivalued
    new IndexScanBuilder(tableSchema, store, mv)
  }
}

private[index] class IndexScanBuilder(full: StructType, store: String,
                                      multivalued: Set[String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var limit: Option[Int] = None

  /** LIMIT n: each shard stops materializing after n hits (Spark still
    * applies the global limit over the union — partial pushdown, like
    * a per-shard `rows=n`). Never combined with a pushed count. */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** Ungrouped COUNT(*) answers from index METADATA: match-all counts
    * come from the commit's live-doc counts, term-filtered counts from
    * posting-list lengths — no stored-field scan at all (Solr's
    * numFound-without-fetch). Partial pushdown: each shard returns its
    * count, Spark sums the partials. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) {
      countPushed = true
      required = StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    }
    ok
  }

  /** Accept ONE string-equality or string-IN on a stored field (a
    * posting lookup per term — the shape the index serves); everything
    * else is residual. The pushed filter is exact (termDocs matches
    * whole terms), so it is NOT returned for re-evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def pushable(a: String) = full.fieldNames.contains(a) && !multivalued.contains(a)
    val idx = filters.indexWhere {
      case EqualTo(a, v: String) => pushable(a) && v != null
      case In(a, vs) => pushable(a) && vs.nonEmpty &&
        vs.forall(v => v != null && v.isInstanceOf[String])
      case _ => false
    }
    val (accepted, residual) =
      if (idx < 0) (Array.empty[Filter], filters)
      else {
        val attr = filters(idx) match {
          case EqualTo(a, _) => a
          case In(a, _) => a
          case _ => ""
        }
        // absorb Catalyst's companion IsNotNull on the SAME field: a
        // posting hit always carries the field, and leaving it residual
        // keeps the column alive through pruning for nothing
        filters.zipWithIndex.partition { case (f, i) =>
          i == idx || (f match {
            case org.apache.spark.sql.sources.IsNotNull(a) => a == attr
            case _ => false
          })
        } match { case (a, r) => (a.map(_._1), r.map(_._1)) }
      }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep only index-known fields; Spark may append metadata structs.
    // After aggregate pushdown the schema IS the agg schema — pruning
    // against the table fields would empty it
    if (!countPushed)
      required = StructType(requiredSchema.fields.filter(f => full.fieldNames.contains(f.name)))

  override def build(): Scan = {
    val term = pushed.collectFirst {
      case EqualTo(a, v: String) => (a, Seq(v))
      case In(a, vs) => (a, vs.toSeq.map(_.asInstanceOf[String]))
    }
    new IndexScan(store, required, term, countPushed, limit)
  }
}

private[index] class IndexScan(store: String, required: StructType,
                               term: Option[(String, Seq[String])],
                               countOnly: Boolean = false,
                               limit: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftIndexScan store=$store pushedTerm=${term.map(t => t._1 + ":" + t._2.mkString("|")).getOrElse("*:*")} " +
      (if (countOnly) "pushedAgg=count(*) " else "") +
      limit.map(n => s"pushedLimit=$n ").getOrElse("") +
      s"columns=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    SegmentShardSink.partIndexDirs(spark, store)
      .map(d => IndexInputPartition(d): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    new IndexReaderFactory(conf, required.fieldNames, term, countOnly, limit)
  }
}

private[index] case class IndexInputPartition(dir: String) extends InputPartition

private[index] class IndexReaderFactory(conf: SerializableHadoopConf,
                                        fields: Array[String],
                                        term: Option[(String, Seq[String])],
                                        countOnly: Boolean = false,
                                        limit: Option[Int] = None)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    if (countOnly) new PartitionReader[InternalRow] {
      // one partial row per shard: live-doc count from commit metadata
      // (match-all) or posting-list cardinality (pushed term)
      private val dir = new Path(partition.asInstanceOf[IndexInputPartition].dir)
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false
        else {
          val reader = new SegmentIndex.Reader(dir.getFileSystem(conf.value), dir)
          val n = term match {
            case Some((f, ts)) => reader.termCountIn(f, ts)
            case None => reader.matchAllCount
          }
          currentRow = InternalRow(n)
          emitted = true
          true
        }
      private var currentRow: InternalRow = _
      override def get(): InternalRow = currentRow
      override def close(): Unit = ()
    }
    else new PartitionReader[InternalRow] {
      private val dir = new Path(partition.asInstanceOf[IndexInputPartition].dir)
      private lazy val docs: Iterator[SegmentIndex.Doc] = {
        val reader = new SegmentIndex.Reader(dir.getFileSystem(conf.value), dir)
        val it = term match {
          case Some((f, Seq(t))) => reader.termDocs(f, t).iterator
          case Some((f, ts)) => reader.termDocsIn(f, ts).iterator
          case None => reader.allDocs()
        }
        limit.map(it.take).getOrElse(it) // per-shard early stop
      }
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!docs.hasNext) false
        else {
          val doc = docs.next()
          val m = SegmentIndex.firstValues(doc)
          current = InternalRow.fromSeq(fields.toIndexedSeq.map(f =>
            m.get(f).map(UTF8String.fromString).orNull))
          true
        }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
