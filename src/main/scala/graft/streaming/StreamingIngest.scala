package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/**
 * Streaming ingest surface. The reference is pure batch (SURVEY.md
 * §2.9) — its closest analog is the per-task
 * beginTransaction/commitTransaction document-loader protocol
 * (DocumentLoader.java:36-60). The Spark-native engine gets continuous
 * index building for free: the same ETL/dedup/route column transforms
 * run under Structured Streaming, with `foreachBatch` playing the role
 * of `loadSolr` (each micro-batch = one reference mapper transaction).
 */
object StreamingIngest {

  /** Open a parquet directory as a stream (schema from the batch read). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /**
   * Watermarked tumbling-window aggregation — the canonical streaming
   * shape: event-time windows, late data bounded by the watermark, and
   * partial aggregation before the shuffle.
   */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /**
   * Micro-batch sink in the reference's transactional-loader shape:
   * each batch is routed/deduped with the SAME batch operators and
   * appended to the shard store — begin/commit per batch like
   * MorphlineMapRunner's per-task transaction (MorphlineMapRunner
   * .java:169,257-260).
   */
  def indexSink(out: String)(transform: DataFrame => DataFrame)
               (events: DataFrame): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        transform(batch).write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow())

  /** Run a streaming query to completion over the available input —
    * local-mode smoke path (memory sink). */
  def runToCompletion(q: StreamingQuery): Unit = {
    q.awaitTermination()
  }
}
