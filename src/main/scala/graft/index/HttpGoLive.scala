package graft.index

/**
 * HTTP go-live (S14, the working transport): merges each built shard
 * into a live Solr-protocol cluster exactly the way the reference's
 * go-live phase does (GoLive.java:46-168) — a bounded driver-side
 * thread pool fans MERGEINDEXES core-admin requests out to the shard
 * URLs, the first failure short-circuits the whole deploy, and only
 * after EVERY merge has reported success does the commit phase run.
 *
 * Request surface (the public Solr core-admin / update protocol):
 *  - merge:  `GET {base}/admin/cores?action=MERGEINDEXES&core={name}
 *    &indexDir={dir}` — `{name}` is the last path segment of the
 *    shard URL and `{base}` the prefix, the same URL split the
 *    reference performs (GoLive.java:68-81); the reference's solrj
 *    `CoreAdminRequest.MergeIndexes` issues this very call.
 *  - commit: `GET {url}/update?commit=true` per distinct target
 *    (GoLive.java:137-146, the non-ZK path; it commits each shard URL
 *    in turn).
 *
 * Ordering contract (tested against an in-process HTTP stub):
 *  1. merges run concurrently, at most `threads` in flight;
 *  2. no commit is sent until all merges completed successfully;
 *  3. a failed merge aborts — pending merges are cancelled, no commit
 *     is ever sent, and the failure propagates to the caller
 *     (GoLive.java:108-123 returns false; here: IOException).
 *
 * Shard dirs are sent verbatim as `indexDir` — callers hand the exact
 * index directory ([[GoLive.segmentShardDirs]] already returns
 * `.../data/index` paths, matching the reference's
 * `dir + "/data/index"` convention at GoLive.java:90).
 */
final class HttpGoLive(threads: Int = 4, timeoutMs: Int = 60000)
    extends GoLive {

  override def goLive(shards: Seq[(Int, String)], targets: Seq[String]): Unit = {
    require(targets.nonEmpty, "no go-live targets")
    require(threads > 0, "goLive thread count must be positive")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val cs = new java.util.concurrent.ExecutorCompletionService[
      Either[(String, Exception), Unit]](pool)
    try {
      // positional shard→URL alignment, the reference's buildShardUrls
      // contract (MapReduceIndexerTool.java:518-537)
      shards.foreach { case (i, dir) =>
        val url = targets(i % targets.size)
        cs.submit(() =>
          try { merge(url, dir); Right(()) }
          catch { case e: Exception => Left((url, e)) })
      }
      var remaining = shards.size
      while (remaining > 0) {
        cs.take().get() match { // completion order, like the reference's
          case Left((url, e)) => // CompletionService.take loop (:103-118)
            pool.shutdownNow() // first failure cancels everything pending
            throw new java.io.IOException(s"live merge into $url failed", e)
          case Right(_) => remaining -= 1
        }
      }
      // commit phase — strictly after the last successful merge
      targets.distinct.foreach(commit)
    } finally pool.shutdownNow()
  }

  /** One MERGEINDEXES core-admin call: split the shard URL into
    * (adminBase, coreName) the way GoLive.java:68-81 does. */
  private def merge(shardUrl: String, indexDir: String): Unit = {
    val base0 = if (shardUrl.endsWith("/")) shardUrl.dropRight(1) else shardUrl
    val cut = base0.lastIndexOf('/')
    if (cut < 0)
      throw new java.io.IOException(s"unexpected shard url: $shardUrl")
    val name = base0.substring(cut + 1)
    val adminBase = base0.substring(0, cut)
    get(s"$adminBase/admin/cores?action=MERGEINDEXES" +
      s"&core=${enc(name)}&indexDir=${enc(indexDir)}")
  }

  private def commit(shardUrl: String): Unit = {
    val base = if (shardUrl.endsWith("/")) shardUrl.dropRight(1) else shardUrl
    get(s"$base/update?commit=true")
  }

  private def get(url: String): Unit = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    try {
      val code = conn.getResponseCode
      if (code / 100 != 2)
        throw new java.io.IOException(s"HTTP $code from $url")
      // drain so keep-alive connections can be reused
      val in = conn.getInputStream
      val buf = new Array[Byte](4096)
      while (in.read(buf) >= 0) {}
      in.close()
    } finally conn.disconnect()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
}
