package graft.util

/** Compute-once-per-key memo for expensive deterministic builds (Lloyd
  * rounds, BPE training, corpus counts). Unlike a bare
  * `ConcurrentHashMap.computeIfAbsent(expensiveBuild)`, the map only
  * installs a cheap cell under its bin lock; the multi-second build
  * runs in the cell's lazy initializer, which the JVM synchronizes PER
  * CELL — so two threads wanting the SAME key serialize on that key
  * alone, and threads wanting different keys that share a map bin never
  * block behind someone else's Spark job (the concurrent Verify loop's
  * failure mode). */
final class KeyedOnce[V] {
  private final class Cell(build: () => V) { lazy val value: V = build() }
  private val cells = new java.util.concurrent.ConcurrentHashMap[String, Cell]()
  def getOrCompute(key: String)(build: => V): V =
    cells.computeIfAbsent(key, _ => new Cell(() => build)).value
}
