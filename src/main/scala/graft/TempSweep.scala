package graft

/** JVM-exit sweep for per-invocation temp output dirs. Operators that
  * materialize a layout (z-order write, upsert sinks, Derby homes) hand
  * their dir here instead of deleting eagerly — a lazily-evaluated result
  * frame may still read the files later in the session, so eager deletion
  * is wrong, while an exit sweep stops repeat invocations (bench passes,
  * Verify runs) from leaking one copy per call. The single registry here
  * is THE sweep implementation — don't re-inline the walk/delete hook. */
object TempSweep {
  private val registered = new java.util.concurrent.atomic.AtomicBoolean
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  def register(p: java.nio.file.Path): Unit = {
    dirs.add(p)
    if (registered.compareAndSet(false, true))
      sys.addShutdownHook { dirs.forEach(deleteRecursively) }
  }

  /** Best-effort deepest-first delete; the walk stream is CLOSED (it holds
    * directory handles open otherwise). */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      val all = try walk.iterator().asScala.toSeq finally walk.close()
      all.sortBy(-_.getNameCount).foreach(f => java.nio.file.Files.deleteIfExists(f))
    } catch { case _: Throwable => () }
}
