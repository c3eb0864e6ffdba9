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
    * falls back to java.io.tmpdir. */
  def freshUnder(base: String, name: String): String = {
    val parent = registered.getOrElseUpdate(s"$base::$name", {
      val b = new java.io.File(base)
      val root = if (b.isDirectory && b.canWrite) b
                 else new java.io.File(sys.props("java.io.tmpdir"))
      val dir = new java.io.File(root, s"$name-${ProcessHandle.current().pid()}")
      dir.mkdirs()
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
      dir.toString
    })
    java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(parent), "q-").toString
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
