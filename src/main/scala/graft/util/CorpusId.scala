package graft.util

import java.nio.file.{Files, Path, Paths}

/** Cheap corpus-identity key for the session memos (RowMemo callers,
  * BpeTrain.trainCached, KMeans.fitCentroidsQCached, SemDedup's count
  * cache). Keying a JVM-lifetime memo on the directory STRING alone
  * assumes the data under it never changes for the JVM's life — true
  * for Verify/Bench/driver runs (fresh JVM, immutable sf dirs) but a
  * latent staleness hazard once the memos are library surface: a
  * long-lived session that rewrites a dir in place would silently be
  * served stale edges/centroids/merges. This key folds a filesystem
  * fingerprint (regular-file count + total bytes + max mtime, walked
  * recursively) into the identity, so an in-place rewrite changes the
  * key and the memo misses instead of lying.
  *
  * The fingerprint is recomputed on EVERY call — memoizing it would
  * reintroduce exactly the staleness it exists to catch. That is fine:
  * a directory walk over a parquet corpus dir (tens of files) is
  * microseconds against the multi-second Spark builds the memos guard,
  * and at 100 TB the corpus is still O(10k) files of metadata, not
  * data. The dir prefix is canonicalized so alias paths (`sf0.1/` vs
  * the absolute form) share one memo entry rather than rebuilding.
  *
  * Degraded mode: an unreadable/vanishing dir (or a file racing the
  * walk) yields a UNIQUE key, so the caller rebuilds — never serves a
  * possibly-stale entry. Uniqueness costs a redundant build, staleness
  * costs a wrong answer; the trade is one-sided.
  */
object CorpusId {

  def key(dir: String): String =
    try {
      val canon = new java.io.File(dir).getCanonicalPath
      val p = Paths.get(canon)
      if (!Files.isDirectory(p)) uniqueKey(dir, "not-a-dir")
      else {
        var n = 0L
        var bytes = 0L
        var mtime = 0L
        val stream = Files.walk(p)
        try {
          val it = stream.iterator()
          while (it.hasNext) {
            val f: Path = it.next()
            if (Files.isRegularFile(f)) {
              n += 1
              bytes += Files.size(f)
              val m = Files.getLastModifiedTime(f).toMillis
              if (m > mtime) mtime = m
            }
          }
        } finally stream.close()
        s"$canon@n${n}b${bytes}m$mtime"
      }
    } catch {
      // Files.walk's iterator wraps mid-walk I/O errors (an entry
      // vanishing or turning unreadable between listing and stat) in
      // UncheckedIOException — a RuntimeException, so catching only
      // IOException let exactly the documented "file racing the walk"
      // case escape and fail the calling memo build instead of
      // degrading to a unique key (ADVICE r12).
      case _: java.io.IOException => uniqueKey(dir, "walk-failed")
      case _: java.io.UncheckedIOException => uniqueKey(dir, "walk-failed")
    }

  private val fallbackSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Never-matching key: forces a fresh build (safe) rather than
    * risking a stale hit (wrong). */
  private def uniqueKey(dir: String, why: String): String =
    s"$dir@$why#${fallbackSeq.incrementAndGet()}"
}
