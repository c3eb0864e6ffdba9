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

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
