package graft.pipeline

/**
 * Spark's `AccumulatorContext` holds only WEAK references to
 * accumulators: a metric accumulator created inside an operator builder
 * is garbage on the driver as soon as the builder returns, even though
 * executor-side task closures still update it — and every late task
 * completion then logs a spurious "attempted to access non-existent /
 * garbage collected accumulator" DAGScheduler error mid-job. Operators
 * register their metric accumulators here to pin a bounded window of
 * strong references for the lifetime of the queries that use them.
 */
private[graft] object AccumulatorRetainer {
  private val refs = new java.util.concurrent.ConcurrentLinkedDeque[AnyRef]

  def retain[A <: AnyRef](a: A): A = {
    refs.addLast(a)
    while (refs.size > 4096) refs.pollFirst()
    a
  }
}
