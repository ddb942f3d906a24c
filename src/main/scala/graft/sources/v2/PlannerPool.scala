package graft.sources.v2

/** Shared bounded fan-out for planning-time per-file metadata reads
  * (geomedea heads, FGB headers, streaming extent checks): serial
  * object-store round trips would make PLANNING the bottleneck on a
  * many-shard lake — Spark's own parquet footer reads use the same
  * trick. One pool per call, bounded at 32 threads, 10-minute guard.
  */
private[v2] object PlannerPool {
  def mapFiles[A, B](files: Seq[A])(f: A => B): Seq[B] = {
    if (files.isEmpty) return Seq.empty
    // daemon threads + shutdownNow: a read hung past the 10-minute guard
    // must neither keep the JVM alive after the planning failure nor
    // linger blocked on a dead object-store connection
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(32, files.size)),
      (r: Runnable) => { val t = new Thread(r, "graft-planner"); t.setDaemon(true); t })
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(files.map(a => scala.concurrent.Future(f(a)))),
      scala.concurrent.duration.Duration(10, "min"))
    finally pool.shutdownNow()
  }
}
