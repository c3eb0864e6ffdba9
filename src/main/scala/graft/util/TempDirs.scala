package graft.util

/** Per-process scratch directories that actually get cleaned up.
  *
  * The write-verify entries (d23, d74) need a scratch path that is
  * (a) unique per JVM — concurrent suites/processes must not clobber
  * each other's output mid-read — and (b) reused WITHIN a JVM and
  * deleted at exit, so repeated runs cannot accumulate corpus copies
  * in the system temp dir (an sf1 run once filled this host's disk).
  * `scoped(name)` returns tmpdir/name-pid and registers one recursive
  * delete-on-exit hook per distinct name.
  */
object TempDirs {
  private val registered = scala.collection.concurrent.TrieMap.empty[String, String]

  def scoped(name: String): String =
    registered.getOrElseUpdate(name, {
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        s"$name-${ProcessHandle.current().pid()}")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
      dir.toString
    })

  /** A FRESH unique subdirectory per call (streaming checkpoints must
    * never be reused across queries — a resumed checkpoint replays
    * prior state), all under one per-process parent with a single
    * delete-on-exit hook. The parent prefers `base` when it is a
    * writable directory (e.g. a tmpfs for checkpoint scratch) and
    * falls back to java.io.tmpdir. The parent itself comes from
    * createTempDirectory — unpredictable name, owner-only perms,
    * collision = failure — never a guessable pid-derived path a
    * co-tenant could pre-plant in a world-writable base. */
  def freshUnder(base: String, name: String): String = {
    val parent = registered.getOrElseUpdate(s"$base::$name", {
      val b = new java.io.File(base)
      val root = if (b.isDirectory && b.canWrite) b
                 else new java.io.File(sys.props("java.io.tmpdir"))
      val dir = java.nio.file.Files
        .createTempDirectory(root.toPath, s"$name-").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
      dir.toString
    })
    java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(parent), "q-").toString
  }

  /** Eager recursive delete for scratch whose useful life ends before
    * JVM exit (e.g. a materialized harness log after its drain) — on a
    * tmpfs, waiting for the exit hook holds RAM for the whole run. */
  def delete(dir: String): Unit = deleteRecursively(new java.io.File(dir))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
