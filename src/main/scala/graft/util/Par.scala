package graft.util

/** Overlap independent driver-blocking work (r17 optimization).
  *
  * Multi-leg serving paths (hybrid retrieval, tier arbitration,
  * request batches) construct each leg with several eager,
  * driver-blocking Spark jobs — quantizer loads, probe-cell collects,
  * bounded candidate collects. Run sequentially, those jobs serialize
  * on the driver while each uses a fraction of the cluster; Spark's
  * scheduler interleaves concurrently-submitted jobs (FIFO
  * back-fill), so evaluating the legs on their own threads overlaps
  * the fixed job-launch latency without changing any leg's result.
  * Results return IN INPUT ORDER, so compositions (unions, fuses)
  * are bit-identical to the sequential build.
  */
object Par {

  /** Concurrent driver jobs saturate well before dozens are in
    * flight (guide §2.6 recommends 2-3; the serving legs are small, so
    * a few more overlap their fixed launch latency) — a request batch
    * of N must not spawn N threads each submitting collect jobs. */
  private val MaxThreads = 6

  def seq[T](parts: Seq[() => T]): Seq[T] = {
    if (parts.sizeIs <= 1) return parts.map(_.apply())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parts.size, MaxThreads))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = parts.map(p => scala.concurrent.Future(p()))
      try fs.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
      catch {
        case e: Throwable =>
          // fail FAST and fail CLEAN: queued thunks must not start
          // (side-effecting legs would keep mutating shared state
          // after the composed operation already failed), and started
          // ones get an interrupt
          pool.shutdownNow()
          throw e
      }
    } finally pool.shutdown()
  }

  def pair[A, B](a: () => A, b: () => B): (A, B) = {
    val r = seq(Seq(() => (a(): Any), () => (b(): Any)))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
