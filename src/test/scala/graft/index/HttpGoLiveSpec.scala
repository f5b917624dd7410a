package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[HttpGoLive]] against an in-process JDK HTTP server that
  * records the request sequence — the reference's request contract
  * (GoLive.java:46-168) asserted offline: merge fan-out, core-name /
  * indexDir parameters, commit-after-all-merges ordering, and
  * first-failure short-circuit with no commit. */
class HttpGoLiveSpec extends AnyFunSuite {

  /** (server, port, log) — log entries are "path?query" in arrival
    * order; paths matching `failPaths` get a 500. */
  private def withServer(failSubstring: Option[String] = None)(
      body: (Int, java.util.concurrent.CopyOnWriteArrayList[String]) => Unit): Unit = {
    val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).map("?" + _).getOrElse("")
      val line = ex.getRequestURI.getPath + q
      log.add(line)
      val fail = failSubstring.exists(line.contains)
      val resp = (if (fail) "fail" else "ok").getBytes("UTF-8")
      ex.sendResponseHeaders(if (fail) 500 else 200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try body(server.getAddress.getPort, log)
    finally server.stop(0)
  }

  private def decoded(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  test("happy path: one MERGEINDEXES per shard, then commits, strictly after") {
    withServer() { (port, log) =>
      val targets = (0 until 4).map(i => s"http://127.0.0.1:$port/solr/shard$i")
      val shards = (0 until 4).map(i => (i, s"/tmp/out/part-0000$i/data/index"))
      new HttpGoLive(threads = 3).goLive(shards, targets)

      val entries = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toList
      val merges = entries.filter(_.contains("MERGEINDEXES"))
      val commits = entries.filter(_.contains("commit=true"))
      assert(merges.size === 4)
      assert(commits.size === 4)
      // each merge carries its core name and the exact index dir
      (0 until 4).foreach { i =>
        val m = merges.map(decoded).find(_.contains(s"core=shard$i"))
        assert(m.isDefined, s"no merge for core shard$i in $merges")
        assert(m.get.contains(s"indexDir=/tmp/out/part-0000$i/data/index"))
        assert(m.get.startsWith("/solr/admin/cores"))
      }
      // commit per shard URL, at the core path
      (0 until 4).foreach { i =>
        assert(commits.exists(_.startsWith(s"/solr/shard$i/update")))
      }
      // ordering: every merge arrived before the first commit
      val firstCommit = entries.indexWhere(_.contains("commit=true"))
      val lastMerge = entries.lastIndexWhere(_.contains("MERGEINDEXES"))
      assert(lastMerge < firstCommit,
        s"commit at $firstCommit preceded merge at $lastMerge: $entries")
    }
  }

  test("a failed merge short-circuits: error propagates, no commit is ever sent") {
    withServer(failSubstring = Some("core=shard1")) { (port, log) =>
      val targets = (0 until 4).map(i => s"http://127.0.0.1:$port/solr/shard$i")
      val shards = (0 until 4).map(i => (i, s"/tmp/out/part-0000$i/data/index"))
      val e = intercept[java.io.IOException] {
        new HttpGoLive(threads = 2).goLive(shards, targets)
      }
      assert(e.getMessage.contains("shard1"))
      Thread.sleep(200) // let any stray in-flight request land
      val entries = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toList
      assert(!entries.exists(_.contains("commit=true")),
        s"commit sent despite merge failure: $entries")
    }
  }

  test("trailing-slash shard URLs split into (base, core) like the reference") {
    withServer() { (port, log) =>
      val targets = Seq(s"http://127.0.0.1:$port/solr/coreA/")
      new HttpGoLive().goLive(Seq((0, "/idx/a")), targets)
      val entries = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toList
      val m = entries.map(decoded).find(_.contains("MERGEINDEXES")).get
      assert(m.contains("core=coreA"))
      assert(m.startsWith("/solr/admin/cores"))
      assert(entries.exists(_.startsWith("/solr/coreA/update?commit=true")))
    }
  }

  test("deploys a real segment store end-to-end against the stub (dirs verbatim)") {
    // build a tiny segment store, list its shard dirs, go-live them;
    // the indexDir params the stub records must be the store's actual
    // data/index dirs
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_golive_").toString
    val df = (1 to 20).map(i => (i.toString, s"v$i")).toDF("id", "v")
    SegmentShardSink.write(df, "id", out, shards = 2)
    val dirs = GoLive.segmentShardDirs(out)
    assert(dirs.size === 2)
    withServer() { (port, log) =>
      val targets = (0 until 2).map(i => s"http://127.0.0.1:$port/solr/s$i")
      new HttpGoLive().goLive(dirs, targets)
      val entries = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toList
      val merges = entries.map(decoded).filter(_.contains("MERGEINDEXES"))
      assert(merges.size === 2)
      dirs.foreach { case (_, dir) =>
        assert(merges.exists(_.contains(s"indexDir=$dir")), s"$dir not in $merges")
      }
    }
  }
}
