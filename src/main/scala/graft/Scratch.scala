package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Shared scratch-directory management for the operators and harness
  * mains that stage real files (warehouse sinks, range-partitioned
  * writes, streaming replay chunks).
  *
  * Two leak modes are handled:
  *   - JVM lifetime: every live dir is removed by ONE exit hook;
  *   - within a long-lived JVM (bench reps, scale runs): allocating a
  *     new dir for a prefix DELETES the previous dir for that prefix —
  *     callers consume a scratch dir's contents before re-invoking the
  *     same operator (each rep materializes its result), so only the
  *     latest dir per prefix is ever live, and disk stays flat across
  *     any number of reps instead of growing linearly.
  */
object Scratch {

  private val latest = new ConcurrentHashMap[String, Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    latest.values.forEach(p => rmTree(p.toFile))
  }))

  /** Recursive delete; descends into directories, tolerates concurrent
    * removal (listFiles null) and missing paths.
    */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Fresh temp dir for `prefix`; the previous dir for the same prefix
    * (if any) is deleted now, and the returned one at JVM exit.
    */
  def dir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    Option(latest.put(prefix, d)).foreach(p => rmTree(p.toFile))
    d
  }
}
