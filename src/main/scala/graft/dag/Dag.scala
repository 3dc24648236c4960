package graft.dag

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import scala.collection.concurrent
import scala.jdk.CollectionConverters._

/** Dependency DAG + bounded-parallel executor (SURVEY §3.1 step 4: the
  * reference schedules nodes topologically with `threads: 4` worker
  * threads — profiles.yml:11 — while each node's query parallelism belongs
  * to the engine below; here Spark's own task scheduler).
  *
  * A node starts as soon as ALL its parents succeed (not level-by-level),
  * which is dbt's actual behavior and keeps the thread pool saturated on
  * wide graphs. Failure propagates: descendants of a failed node are
  * SKIPPED, independent subgraphs keep running.
  */
object Dag {

  final case class NodeResult(name: String, status: String, // success|error|skipped
                              durationMs: Long, error: Option[String])

  /** Kahn toposort; raises on cycles (parse-time validation). */
  def topoSort(nodes: Seq[String], parents: Map[String, Seq[String]]): Seq[String] = {
    val indeg = scala.collection.mutable.Map(
      nodes.map(n => n -> parents.getOrElse(n, Nil).count(nodes.contains)): _*)
    val children = nodes.map(n => n -> nodes.filter(
      c => parents.getOrElse(c, Nil).contains(n))).toMap
    val queue = scala.collection.mutable.Queue(
      nodes.filter(indeg(_) == 0).sorted: _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      out += n
      children(n).foreach { c =>
        indeg(c) -= 1
        if (indeg(c) == 0) queue.enqueue(c)
      }
    }
    if (out.size != nodes.size)
      throw new IllegalStateException(
        s"cycle detected among: ${nodes.diff(out.toSeq).mkString(", ")}")
    out.toSeq
  }

  /** Run `exec` for every node, `threads`-wide, parents-before-children.
    *
    * Event-driven scheduling: a node is SUBMITTED to the pool only once all
    * its in-graph parents finished, so workers never block waiting on
    * upstream state. (The previous design parked every node's worker on a
    * latch, which deadlocks by thread starvation whenever ≥ `threads`
    * not-yet-ready nodes are picked up before their parents — e.g. any
    * child that sorts before its parent under threads=1.)
    */
  def run(nodes: Seq[String], parents: Map[String, Seq[String]], threads: Int,
          failFast: Boolean = false)
         (exec: String => Unit): Seq[NodeResult] = {
    topoSort(nodes, parents) // validates acyclicity up front
    val nodeSet = nodes.toSet
    // dbt --fail-fast: after the first error, no NEW node starts (rows
    // already in flight finish); everything not yet started reports
    // skipped. Without the flag, only the failure's descendants skip.
    @volatile var aborted = false
    val pool = Executors.newFixedThreadPool(threads)
    val results: concurrent.Map[String, NodeResult] =
      new ConcurrentHashMap[String, NodeResult]().asScala
    val childrenOf = nodes.map(n => n -> nodes.filter(
      c => parents.getOrElse(c, Nil).contains(n))).toMap
    val pending = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    nodes.foreach(n => pending.put(n,
      new java.util.concurrent.atomic.AtomicInteger(
        parents.getOrElse(n, Nil).count(nodeSet.contains))))
    val done = new CountDownLatch(nodes.size)

    def finish(n: String, r: NodeResult): Unit = {
      results.put(n, r)
      childrenOf(n).foreach { c =>
        if (pending.get(c).decrementAndGet() == 0) submit(c)
      }
      done.countDown()
    }

    def submit(n: String): Unit = {
      pool.submit(new Runnable {
        override def run(): Unit = {
          val failedParent = parents.getOrElse(n, Nil)
            .exists(p => results.get(p).exists(_.status != "success"))
          if (failedParent) {
            finish(n, NodeResult(n, "skipped", 0, Some("upstream failed")))
          } else if (failFast && aborted) {
            finish(n, NodeResult(n, "skipped", 0, Some("fail-fast")))
          } else {
            val t0 = System.nanoTime()
            try { exec(n); finish(n, NodeResult(n, "success",
              (System.nanoTime() - t0) / 1000000, None)) }
            catch { case e: Throwable =>
              aborted = true
              finish(n, NodeResult(n, "error",
                (System.nanoTime() - t0) / 1000000,
                Some(Option(e.getMessage).getOrElse(e.getClass.getName)))) }
          }
        }
      })
      ()
    }

    nodes.filter(n => pending.get(n).get() == 0).foreach(submit)
    val finished = done.await(4, TimeUnit.HOURS)
    pool.shutdown()
    if (!finished) {
      pool.shutdownNow()
      val stuck = nodes.filterNot(results.contains)
      throw new IllegalStateException(
        s"DAG run timed out after 4h; unfinished nodes: ${stuck.mkString(", ")}")
    }
    nodes.map(results(_))
  }
}
