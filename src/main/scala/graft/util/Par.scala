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

  def seq[T](parts: Seq[() => T]): Seq[T] = {
    if (parts.sizeIs <= 1) return parts.map(_.apply())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parts.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = parts.map(p => scala.concurrent.Future(p()))
      fs.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }

  def pair[A, B](a: () => A, b: () => B): (A, B) = {
    val r = seq(Seq(() => (a(): Any), () => (b(): Any)))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
