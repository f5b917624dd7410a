package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming live-Solr ingest: micro-batches stream over real HTTP
  * into a recording stub; every document arrives exactly once on the
  * router's shard, and each batch commits after its own adds (the
  * per-batch transaction cadence). */
class LiveSolrStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("micro-batches post routed docs per batch, commit after each batch's adds") {
    val log = new java.util.concurrent.CopyOnWriteArrayList[(String, String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      log.add((ex.getRequestURI.getPath + q, ex.getRequestMethod, body))
      ex.sendResponseHeaders(200, 2)
      ex.getResponseBody.write("ok".getBytes("UTF-8"))
      ex.close()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    server.setExecutor(pool)
    server.start()
    try {
      val port = server.getAddress.getPort
      val targets = (0 until 2).map(i => s"http://127.0.0.1:$port/solr/shard$i")
      // two micro-batches: two files staged with distinct mtimes
      val staged = java.nio.file.Files.createTempDirectory("live_stream_").toString
      val events = Tables.events(spark, TestSpark.sf)
        .select(col("event_id"), col("event_type")).limit(300).cache()
      events.where(col("event_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$staged/b0")
      Thread.sleep(1100)
      events.where(col("event_id") % 2 === 1)
        .coalesce(1).write.parquet(s"$staged/b1")
      val schema = spark.read.parquet(s"$staged/b0").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(s"$staged/*")
      val q = StreamingIngest.liveSolrSink(targets, "event_id", batchSize = 32)(
        b => b)(stream)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("live_ckpt_").toString)
        .start()
      try q.awaitTermination(60000) finally if (q.isActive) q.stop()

      val entries = log.toArray.toSeq.map(_.asInstanceOf[(String, String, String)])
      val posts = entries.filter(e => e._2 == "POST" && e._1.endsWith("/update"))
      val commits = entries.zipWithIndex.filter(_._1._1.contains("commit=true"))
      // one commit per target per micro-batch
      assert(commits.size === 4, s"expected 2 batches x 2 targets commits, got ${commits.size}")
      // all 300 docs arrived exactly once, on the router's shard
      val router = graft.route.HashRangeRouter(2)
      val ids = scala.collection.mutable.ArrayBuffer[Long]()
      posts.foreach { case (path, _, body) =>
        val shard = path.split("/solr/shard")(1).takeWhile(_.isDigit).toInt
        """"event_id":(\d+)""".r.findAllMatchIn(body).foreach { m =>
          ids += m.group(1).toLong
          assert(router.shardOfId(m.group(1)) === shard)
        }
      }
      assert(ids.sorted.toSeq === events.select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq)
      // transaction cadence: the first commit precedes the last add
      // (batch 1's adds come after batch 0's commit)
      val firstCommitIdx = commits.head._2
      val lastPostIdx = entries.zipWithIndex
        .filter(e => e._1._2 == "POST" && e._1._1.endsWith("/update")).last._2
      assert(firstCommitIdx < lastPostIdx,
        "expected per-batch commits interleaved with adds, saw one commit phase")
      events.unpersist()
    } finally { server.stop(0); pool.shutdownNow() }
  }
}
