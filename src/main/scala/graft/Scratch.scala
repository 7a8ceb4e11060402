package graft

/** Deterministic per-process scratch directories for query fixtures.
  *
  * Fixture-writing queries (shard archives, zone-mapped layouts,
  * streaming sinks) need a disk workspace per invocation. Fresh
  * `Files.createTempDirectory` dirs leak: under the full-surface bench
  * sweep every warm-up plus rep re-authors its fixtures into a new
  * /tmp dir, accumulating unbounded disk across runs. This keys the
  * workspace by (tag, sfDir) instead, WIPING it on every call — so
  * repeated reps overwrite one copy rather than accumulating — and
  * scopes the root by PID so two concurrently running JVMs (a bench
  * overlapping a verify) can never corrupt each other's fixtures. A
  * shutdown hook removes the whole root on clean JVM exit.
  */
object Scratch {

  private def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
    }

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_scratch_${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(r)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRec(r) catch { case _: Exception => () }))
    r
  }

  private def sanitize(s: String): String =
    s.replaceAll("[^A-Za-z0-9.]+", "_")

  /** The deterministic workspace for (tag, sfDir), wiped clean. Every
    * invocation of the same query at the same scale reuses (and
    * re-authors) ONE directory — bounded disk however many reps run.
    */
  def fresh(tag: String, sfDir: String): String = {
    val d = root.resolve(s"${sanitize(tag)}_${sanitize(sfDir)}")
    deleteRec(d)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }
}
