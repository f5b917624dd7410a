package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Drives [[LiveSolrSink]] / [[ConcurrentUpdateClient]] against an
  * in-process JDK HTTP server recording every request — the
  * reference's live-load contract asserted offline: batch flushing at
  * batchSize (SolrClientDocumentLoader.java:68-96), first-failure
  * propagation at blockUntilFinished
  * (SafeConcurrentUpdateSolrClient.java:55-63), best-effort rollback
  * on the failure path (:101-108), routing alignment with the
  * composite-id router, and cluster commit strictly after all adds. */
class LiveSolrSpec extends AnyFunSuite {

  /** Records (path, method, body) per request; paths containing
    * `failSubstring` get a 500. */
  private def withServer(failSubstring: Option[String] = None)(
      body: (Int, java.util.concurrent.CopyOnWriteArrayList[(String, String, String)]) => Unit)
      : Unit = {
    val log = new java.util.concurrent.CopyOnWriteArrayList[(String, String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      val path = ex.getRequestURI.getPath + q
      val reqBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      log.add((path, ex.getRequestMethod, reqBody))
      val fail = failSubstring.exists(path.contains)
      val resp = (if (fail) "fail" else "ok").getBytes("UTF-8")
      ex.sendResponseHeaders(if (fail) 500 else 200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    server.setExecutor(pool)
    server.start()
    try body(server.getAddress.getPort, log)
    finally { server.stop(0); pool.shutdownNow() }
  }

  test("client flushes at batchSize and drains on blockUntilFinished") {
    withServer() { (port, log) =>
      val c = new ConcurrentUpdateClient(
        s"http://127.0.0.1:$port/solr/s0", batchSize = 3,
        queueSize = 2, workers = 2, timeoutMs = 5000)
      (1 to 10).foreach(i => c.load(s"""{"id":$i}"""))
      c.blockUntilFinished()
      c.shutdown()
      assert(c.numLoaded == 10)
      val posts = log.toArray.toSeq.map(_.asInstanceOf[(String, String, String)])
        .filter(_._2 == "POST")
      // 10 docs at batchSize 3 → 3 full batches + 1 tail of 1
      val sizes = posts.map(_._3.count(_ == '{')).sorted
      assert(sizes == Seq(1, 3, 3, 3))
      // every body is a JSON array of docs
      posts.foreach { case (_, _, b) =>
        assert(b.startsWith("[") && b.endsWith("]"))
      }
      // all 10 ids arrived exactly once
      val ids = posts.flatMap(_._3.split("\\{\"id\":").drop(1))
        .map(_.takeWhile(_.isDigit).toInt).sorted
      assert(ids == (1 to 10))
    }
  }

  test("first HTTP failure propagates at blockUntilFinished (Safe contract)") {
    withServer(failSubstring = Some("/solr/s0/update")) { (port, log) =>
      val c = new ConcurrentUpdateClient(
        s"http://127.0.0.1:$port/solr/s0", batchSize = 1,
        queueSize = 1, workers = 1, timeoutMs = 5000)
      c.load("""{"id":1}""")
      val e = intercept[java.io.IOException] {
        c.load("""{"id":2}"""); c.blockUntilFinished()
      }
      assert(e.getMessage.contains("live update"))
      c.shutdown()
    }
  }

  test("sink: routed writes land on the router's shard, commit strictly last") {
    val spark = TestSpark.spark
    withServer() { (port, log) =>
      val targets = (0 until 4).map(i => s"http://127.0.0.1:$port/solr/shard$i")
      val df = spark.read.parquet(s"${TestSpark.sf}/part.parquet")
        .select(org.apache.spark.sql.functions.col("p_partkey"),
          org.apache.spark.sql.functions.col("p_name"))
        .limit(200)
      LiveSolrSink.write(df, "p_partkey", targets, batchSize = 16)
      val entries = log.toArray.toSeq.map(_.asInstanceOf[(String, String, String)])
      val posts = entries.filter(_._2 == "POST")
      val commits = entries.filter(_._1.contains("commit=true"))
      // commit once per target, and nothing after the last commit but commits
      assert(commits.size == 4)
      val firstCommitIdx = entries.indexWhere(_._1.contains("commit=true"))
      assert(entries.drop(firstCommitIdx).forall(_._1.contains("commit=true")),
        "no add may follow the first commit")
      // every posted doc sits on the exact shard the router assigns
      val router = graft.route.HashRangeRouter(4)
      posts.foreach { case (path, _, body) =>
        val shard = path.split("/solr/shard")(1).takeWhile(_.isDigit).toInt
        """"p_partkey":(\d+)""".r.findAllMatchIn(body).foreach { m =>
          assert(router.shardOfId(m.group(1)) == shard,
            s"doc ${m.group(1)} posted to shard $shard")
        }
      }
      // all 200 docs arrived exactly once across shards
      val n = posts.map(_._3.count(_ == '{')).sum
      assert(n == 200)
    }
  }

  test("sink: shard failure fails the job, rolls back, never commits") {
    val spark = TestSpark.spark
    withServer(failSubstring = Some("/solr/shard2/")) { (port, log) =>
      val targets = (0 until 4).map(i => s"http://127.0.0.1:$port/solr/shard$i")
      val df = spark.read.parquet(s"${TestSpark.sf}/part.parquet")
        .select(org.apache.spark.sql.functions.col("p_partkey")).limit(100)
      intercept[org.apache.spark.SparkException] {
        LiveSolrSink.write(df, "p_partkey", targets, batchSize = 8)
      }
      val entries = log.toArray.toSeq.map(_.asInstanceOf[(String, String, String)])
      // the failing task attempted a rollback on its target
      assert(entries.exists { case (p, m, b) =>
        p.contains("shard2") && m == "POST" && b.contains("rollback") })
      // job failed before the driver-side commit phase
      assert(!entries.exists(_._1.contains("commit=true")))
    }
  }
}
