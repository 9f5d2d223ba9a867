package graft

import org.apache.spark.sql.Dataset

/** Deterministic lifecycle for operator-internal caches.
  *
  * The sketch operators (MinHash-LSH, SimHash, LSH/IVF ANN, Jaccard)
  * persist an intermediate that several downstream joins re-read (the
  * signature / banded / bucketed table). A bare `.persist()` there
  * leaks: the builder returns a lazy DataFrame, the caller runs the
  * action, and nobody ever unpersists — repeated invocations pin ever
  * more blocks in executor storage, and at 100 TB pinning the full
  * banded table across query invocations is not a viable design.
  *
  * Instead the operators register every persist here, and the
  * consuming action releases them in a `try/finally`
  * ([[scoped]] — used by Verify, Bench, and the specs). The cache then
  * lives exactly as long as the one action that benefits from it,
  * which is the cluster-scale equivalent of a scratch table dropped at
  * the end of the job.
  */
object CacheScope {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  private val depth: ThreadLocal[Integer] = ThreadLocal.withInitial(() => 0)

  /** True while the calling thread is inside a [[scoped]] block —
    * i.e. someone has taken responsibility for releasing the caches
    * registered via [[cached]]. Operators whose correctness depends on
    * a cache surviving until the consuming action (DistributedRank)
    * assert this instead of silently leaking for bare callers.
    */
  def isActive: Boolean = depth.get() > 0

  /** Persist `ds` (default storage level) and track the handle for the
    * enclosing [[scoped]] block to release.
    */
  def cached[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    live.add(p)
    p
  }

  /** Unpersist every tracked dataset. Idempotent; `blocking = false`
    * lets executors drop blocks asynchronously.
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var d = live.poll()
    while (d != null) {
      d.unpersist(blocking)
      d = live.poll()
    }
  }

  /** Run the consuming action, then release every cache it registered
    * — the materialize-then-unpersist lifecycle.
    */
  def scoped[T](body: => T): T = {
    depth.set(depth.get() + 1)
    try body
    finally {
      depth.set(depth.get() - 1)
      // only the outermost scope releases — a nested scope must not
      // pull caches out from under its enclosing action
      if (depth.get() == 0) releaseAll()
    }
  }
}
