package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Shared scratch-directory management for the operators and harness
  * mains that stage real files (warehouse sinks, range-partitioned
  * writes, streaming replay chunks).
  *
  * Two leak modes are handled:
  *   - JVM lifetime: every live dir is removed by ONE exit hook;
  *   - within a long-lived JVM (bench reps, scale runs): dirs per prefix
  *     are kept to the most recent [[KeepPerPrefix]] — older ones are
  *     deleted at allocation time, so disk stays flat across any number
  *     of reps instead of growing linearly.
  *
  * Keep-last-2, not keep-last-1: query builders return LAZY DataFrames
  * that still read the staged files, so allocating a new dir must not
  * delete the one an un-materialized previous plan may still reference
  * (parallel specs, interleaved harness calls). With N=2 the dir being
  * deleted is two allocations old — its plan has either been consumed
  * (the bench/verify harnesses materialize each rep before the next
  * invocation) or abandoned. Only a caller interleaving THREE
  * un-consumed invocations of the same operator could observe a deleted
  * file; no harness in this repo does, and the contract is documented
  * here rather than at every call site.
  */
object Scratch {

  /** Live dirs retained per prefix before the oldest is reclaimed. */
  val KeepPerPrefix = 2

  private val recent = new ConcurrentHashMap[String, List[Path]]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    recent.values.forEach(_.foreach(p => rmTree(p.toFile)))
  }))

  /** Recursive delete; descends into directories, tolerates concurrent
    * removal (listFiles null) and missing paths.
    */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Fresh temp dir for `prefix`; dirs older than the newest
    * [[KeepPerPrefix]] for the same prefix are deleted now, the rest at
    * JVM exit.
    */
  def dir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    var evicted: List[Path] = Nil
    recent.compute(prefix, (_, old) => {
      val (keep, drop) = (d :: Option(old).getOrElse(Nil)).splitAt(KeepPerPrefix)
      evicted = drop
      keep
    })
    evicted.foreach(p => rmTree(p.toFile))
    d
  }
}
