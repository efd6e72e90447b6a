package graft.core

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, ExecutionContextExecutorService, Future}

/** Driver-side parallelism for independent blocking Spark actions —
  * model fits above all. Spark fully supports concurrent job
  * submission from multiple driver threads (scheduling is per-job);
  * at bench scale each MLlib fit pays ~0.8-1 s of fixed multi-job
  * overhead that data-size reduction cannot remove, so running the
  * independent fits of a fold loop / seed bag / one-vs-rest sweep /
  * per-subspace codebook concurrently overlaps exactly that overhead.
  * On a real cluster the same overlap keeps executors busy while the
  * driver plans the next fit.
  *
  * Nested sections (a seed bag whose per-seed work is itself a fold
  * loop) run the INNER level sequentially on the calling worker
  * thread: a bounded pool whose tasks block awaiting tasks of the
  * same pool can deadlock, and the outer level already owns the
  * available concurrency. Results always return in input order, and
  * every fit is seeded-deterministic, so output is identical to the
  * sequential loop.
  */
object Par {

  private val parallelism: Int =
    math.min(8, math.max(2, Runtime.getRuntime.availableProcessors() / 4))

  private lazy val ec: ExecutionContextExecutorService =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(parallelism, { (r: Runnable) =>
        val t = new Thread(r, "graft-par")
        t.setDaemon(true)
        t
      }))

  private val inPar: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Map `f` over `xs` with bounded driver-side parallelism, returning
    * results in input order. Falls back to a plain sequential map for
    * trivial inputs and for calls already running inside a Par task. */
  def mapPar[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(1) <= 0 || inPar.get()) xs.map(f)
    else {
      val fs = xs.map { x =>
        Future {
          inPar.set(java.lang.Boolean.TRUE)
          try f(x)
          finally inPar.set(java.lang.Boolean.FALSE)
        }(ec)
      }
      fs.map(Await.result(_, Duration.Inf))
    }
}
