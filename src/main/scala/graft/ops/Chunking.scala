package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Training-window preparation: split documents into fixed-size token
 * chunks (with stride/overlap), and pack documents into
 * context-window-sized groups.
 *
 * Chunking is a pure projection + explode — no shuffle, codegen'd,
 * embarrassingly parallel: the right 100 TB shape (output rows ≈
 * tokens/stride per doc, produced where the doc is read).
 *
 * Packing comes in two variants:
 *  - `packByBudget`: "budget bucketing" — pack id = exclusive running
 *    token sum ÷ budget within each group. Deterministic and plain
 *    SQL (window cumsum), so it is DuckDB-oracle-checkable; a pack
 *    may overflow the budget by at most one document's tokens.
 *  - `packGreedy`: the exact greedy first-fit-in-order semantics
 *    (reset when the budget would overflow — what a sequence-packing
 *    loader actually does). Inherently sequential per group, so it
 *    runs as a per-partition pass after one repartition on the group
 *    key: one shuffle, no driver involvement, each group's scan is
 *    O(docs in group).
 */
object Chunking {

  /** Chunk start offsets 0, stride, 2·stride … capped at nTokens-1
    * (a single [0] for empty docs — one empty chunk, so every doc
    * survives into the chunked corpus). */
  def chunkBounds(nTokens: Column, stride: Int): Column =
    sequence(lit(0), greatest(nTokens - 1, lit(0)), lit(stride))

  /**
   * Explode `tokensCol` into (id, chunk_start, n_chunk_tokens,
   * chunk_text) rows of `chunkSize` tokens every `stride` tokens.
   * stride < chunkSize gives overlapping windows (the usual LM
   * pre-processing when documents exceed the context length).
   */
  def chunkTokens(df: DataFrame, id: Column, tokensCol: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    df.select(id.as("doc_id"), tokensCol.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(chunkBounds(size(col("__toks")), stride)).as("chunk_start"))
      .select(col("doc_id"), col("chunk_start").cast("long").as("chunk_start"),
        size(slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /**
   * Budget bucketing: pack_id = floor(exclusive-prefix-sum(cost) /
   * budget) over `order` within `grp`. The first document of a group
   * is always pack 0; a document straddling a boundary belongs to the
   * pack its FIRST token falls in (packs can overflow by < one doc).
   */
  def packByBudget(df: DataFrame, grp: Column, order: Column,
                   cost: Column, budget: Long): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(grp).orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("pack_id",
      floor(coalesce(sum(cost).over(w), lit(0L)) / budget).cast("long"))
  }

  /**
   * Exact greedy packing: walk each group in `order`, accumulate
   * `cost`, start a new pack when adding the next document would
   * exceed `budget` (an oversized single document gets a pack of its
   * own). Appends `pack_id` (per-group, 0-based).
   *
   * One repartition on the group key + a sorted per-partition pass —
   * the sequential dependency is per GROUP, so parallelism = number
   * of groups, the best any exact packing can do.
   */
  def packGreedy(df: DataFrame, grpCol: String, orderCol: String,
                 costCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    // validate the cost type up front: the per-partition pass reads it
    // as a long, and a surprise IntegerType would otherwise surface as
    // a ClassCastException deep inside a task
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val costType = df.schema(costCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(costType),
      s"packGreedy cost column '$costCol' must be an integral type " +
        s"(byte/short/int/long), got $costType — cast it first")
    val schema: StructType = df.schema.add("pack_id", LongType, nullable = false)
    val grpIdx = df.schema.fieldIndex(grpCol)
    val costIdx = df.schema.fieldIndex(costCol)
    val sorted = df.repartition(col(grpCol)).sortWithinPartitions(col(grpCol), col(orderCol))
    sorted.mapPartitions { rows =>
      var curGrp: Any = null
      var first = true
      var packId = 0L
      var used = 0L
      rows.map { r =>
        val g = r.get(grpIdx)
        val c = r.get(costIdx).asInstanceOf[java.lang.Number].longValue()
        if (first || g != curGrp) { curGrp = g; first = false; packId = 0L; used = 0L }
        if (used > 0 && used + c > budget) { packId += 1; used = 0L }
        used += c
        Row.fromSeq(r.toSeq :+ packId)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Pack ASSEMBLY (L115): the text-producing half of sequence packing
   * — [[packByBudget]] assigns pack ids, then each pack's documents
   * concatenate in `order` with `sep` between them (the end-of-
   * document marker a pretraining loader inserts). Output one row per
   * pack: (grp, pack_id, n_docs, pack_cost, packed_text).
   *
   * The ordered concat is the engine's deterministic-aggregation
   * idiom: collect_list of (order, text) structs, array_sort (total
   * order — `order` must be unique within a group), then a map-side
   * join — no ordering is ever asked of the unordered aggregate
   * itself. One shuffle on (grp, pack_id) beyond packByBudget's
   * window.
   */
  def packTexts(df: DataFrame, grp: Column, order: Column, cost: Column,
                budget: Long, text: Column, sep: String): DataFrame =
    packByBudget(df, grp, order, cost, budget)
      .groupBy(grp.as("grp"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(cost).as("pack_cost"),
        array_join(
          transform(
            array_sort(collect_list(struct(order.as("o"), text.as("t")))),
            x => x.getField("t")),
          sep).as("packed_text"))
}

/**
 * SFT/chat corpus assembly: turn per-event rows into rendered
 * conversation transcripts with LOSS-MASK spans — the artifact an
 * instruction-tuning loader consumes (only the masked roles' spans
 * contribute to the loss).
 *
 * Rendering contract (declared, deterministic):
 *  - each turn renders as `[<role>] <text>`, turns joined by `\n` in
 *    (order) sequence;
 *  - `mask_spans` carries `start:end` character offsets (0-based,
 *    end-exclusive) of every masked-role LINE in the transcript,
 *    joined by `|` in turn order — so a loader can slice the loss
 *    region without re-tokenizing the template.
 *
 * Shape: offsets come from one window (cumulative rendered length)
 * on the conversation key; the transcript itself uses the ordered-
 * aggregate idiom (collect -> array_sort -> map) riding the SAME
 * hash partitioning, so the whole assembly is ONE shuffle. At 100 TB
 * conversations are bounded (a chat fits memory by construction);
 * the group key is the only fan-in.
 */
object SftAssembly {
  import org.apache.spark.sql.expressions.Window

  def assembleConversations(df: DataFrame, grp: Column, order: Seq[Column],
                            role: Column, text: Column,
                            maskRoles: Seq[String]): DataFrame = {
    require(order.nonEmpty, "conversation order columns required")
    val line = concat(lit("["), role, lit("] "), text)
    // start = rendered length of all preceding lines (+1 per \n)
    val staged = df.select(grp.as("grp"), role.as("__r"), line.as("__line"),
        struct(order: _*).as("__o"))
      .withColumn("__start",
        coalesce(sum(length(col("__line")) + 1).over(
          Window.partitionBy(col("grp")).orderBy(col("__o"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__end", col("__start") + length(col("__line")))
    val span = concat(col("__start"), lit(":"), col("__end"))
    staged.groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__o"), col("__line").as("l")))),
            x => x.getField("l")),
          "\n").as("transcript"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__r").isin(maskRoles.map(lit): _*),
                struct(col("__o"), span.as("s"))))),
            x => x.getField("s")),
          "|").as("mask_spans"))
  }
}
