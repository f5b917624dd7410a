package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stateful stream sessionization matches the batch session count") {
    // batch truth: q15-style gap sessions -> sessions per user
    val ev = Tables.events(spark, TestSpark.sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sec = col("ts").cast("long")
    val newSession = when(lag(sec, 1).over(w).isNull || sec - lag(sec, 1).over(w) > 1800, 1)
      .otherwise(0)
    val batchSessions = ev.withColumn("ns", newSession)
      .groupBy(col("user_id")).agg(sum(col("ns")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // stream: replay events; the final (unclosed) session per user is
    // still in state when input ends, so the stream emits
    // (batch sessions - 1) per user plus timeouts Spark fires at end
    val staged = java.nio.file.Files.createTempDirectory("graft_sess_in_").toString
    ev.write.mode("overwrite").parquet(staged)
    val stream = StreamingIngest.readEvents(spark, staged)
    val q = StreamingIngest.sessionizeStream(stream)
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("graft_sessions")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every closed session the stream emitted must exist in the batch
    // truth; per user the stream emits between n-1 (last session open)
    // and n sessions
    assert(got.nonEmpty)
    got.foreach { case (user, n) =>
      val expected = batchSessions(user)
      assert(n >= expected - 1 && n <= expected, s"user $user: stream=$n batch=$expected")
    }
  }
}
