package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs: turns the
  * pair list (d6/d8/d18, or d38's cosine edges) into a per-document
  * dedup decision — every doc gets a cluster representative (the
  * minimum doc_id reachable through the similarity graph), and "keep
  * one per cluster" falls out.
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR edge contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — a public MapReduce-era algorithm that maps 1:1 onto
  * DataFrame windows). Each round REWRITES THE EDGE SET:
  *
  *   large-star: every node u re-attaches each larger neighbor v
  *     directly to m = min(neighborhood(u) ∪ u);
  *   small-star: every node attaches its smaller neighbors (and
  *     itself) to their collective minimum.
  *
  * Both operations preserve the component partition, strictly flatten
  * long paths, and the set converges to one star per component
  * centered at the component's minimum id in O(log² n) rounds
  * REGARDLESS of how ids are laid out on the graph.
  *
  * Why not label propagation: the previous scheme (neighbor-min label
  * propagation + pointer jumping) is O(diameter) in the worst case,
  * not O(log diameter) — a label chain stalls at every id-space local
  * minimum, and following label-of-label cannot jump past a vertex
  * whose label is itself. Measured: a 400-vertex path with randomly
  * permuted ids does not converge in 60 rounds under label
  * propagation with any per-round hop count, while star contraction
  * lands it in 7 rounds (and d38's sf0.1 cosine graph, diameter ~22,
  * needed 11 label rounds vs 5 star rounds). Star contraction
  * restructures the EDGES each round, which is what makes the
  * logarithmic bound hold — at 100 TB, where one boilerplate-drift
  * chain with unlucky ingest ids would otherwise stall the whole
  * dedup job, that distinction is the scale story.
  *
  * Execution shape: each round is ONE job — three 8-byte-keyed
  * shuffles (window per large-star group, window per small-star
  * group, final dedup) materialized by a checkpoint (lineage
  * truncation — localCheckpoint by default; pass reliable=true for
  * durable checkpoints that survive executor loss on long cluster
  * runs). Convergence rides a task-side accumulator: a
  * round is the identity exactly when the edge set is already a star
  * forest, and every non-star structure produces a per-row change
  * flag (a rewritten edge m≠u, or a multi-parent node p≠m), so
  * "flags == 0" detects the fixpoint with no extra driver action.
  * Task retries can only inflate the count and convergence tests
  * == 0, so at-least-once accumulator semantics are safe.
  */
object DedupClusters {

  /** @param docs   one row per document, column `doc_id`
    * @param pairs  undirected edges: columns `a_id`, `b_id`
    * @param reliable  false (default): per-round materialization uses
    *         localCheckpoint — fastest, but round state lives on
    *         executors and an executor loss mid-job is unrecoverable.
    *         true: rounds checkpoint to the SparkContext checkpoint
    *         directory (set `sc.setCheckpointDir` to durable storage
    *         first), so a lost executor replays from the last round —
    *         the right mode for long cluster runs at 100 TB.
    * @param localFinishEdges  hybrid cutover (Kiveris et al. §6 finish
    *         small graphs locally): at the top of each round the
    *         materialized edge set's size is read (one no-shuffle pass
    *         over checkpointed blocks), and once it is ≤ this bound the
    *         remaining components are solved by an EXACT single-task
    *         union-find (executor-side `mapPartitions` over the edges
    *         coalesced to one partition — min-root union + path
    *         compression, the same min-id star forest the contraction
    *         converges to, in ONE job instead of the O(log² n)
    *         convergence tail whose per-round cost is all scheduling
    *         once the graph is small). At 100 TB the first rounds run
    *         distributed and shrink the edge set monotonically, so the
    *         cutover fires exactly when round latency would stop being
    *         data-bound; 0 disables the hybrid (pure contraction —
    *         DedupSpec pins parity between the two paths).
    * @return (doc_id, cluster_id) — cluster_id = min doc_id in component
    * @throws IllegalStateException if the iteration cap is hit before
    *         convergence: returning silently would hand the caller
    *         split clusters. With the O(log² n) star contraction the
    *         default cap of 50 covers any realistic graph (a
    *         5000-vertex adversarial chain converges in 10). Also
    *         thrown up front when reliable=true without a checkpoint
    *         directory. */
  def assign(docs: DataFrame, pairs: DataFrame, maxIterations: Int = 50,
             reliable: Boolean = false,
             localFinishEdges: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (reliable && spark.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        "reliable=true requires sc.setCheckpointDir (durable storage)")
    def materialize(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    var e = materialize(pairs
      .select(least($"a_id", $"b_id").as("p"), greatest($"a_id", $"b_id").as("c"))
      .filter($"p" =!= $"c")
      .distinct())
    val changedAcc = spark.sparkContext.longAccumulator("graft-stars-changed")
    val rowsAcc = spark.sparkContext.longAccumulator("graft-stars-rows")
    // Hybrid-cutover size tracking with NO extra job on the big-graph
    // path: the one exact e.count() runs before round 0 (a no-shuffle
    // pass over checkpointed blocks); every later round reuses the
    // row count its own materialization map already folded into
    // rowsAcc. That accumulator counts the round's PRE-distinct
    // output — an upper bound on |e| (task retries only inflate it,
    // so at-least-once semantics keep it a bound), and a bound is all
    // the cutover test needs: localStars tolerates duplicate edges.
    var edgeBound = -1L
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      if (localFinishEdges > 0 && {
            if (edgeBound < 0) edgeBound = e.count()
            edgeBound <= localFinishEdges
          }) {
        // small tail: ONE single-task union-find job instead of the
        // O(log² n) scheduling-bound convergence rounds
        e = materialize(localStars(e))
        converged = true
      } else {
      val sym = e.select($"p".as("u"), $"c".as("v"))
        .unionByName(e.select($"c".as("u"), $"p".as("v")))
      // large-star: m = min(Γ(u) ∪ u); larger neighbors re-attach to m.
      // Emitted edges (m, v) have m ≤ u < v — already canonical.
      // chgL marks a rewritten edge: m ≠ u means u had a smaller
      // neighbor while also owning larger ones — impossible in a star.
      val ls = sym
        .withColumn("m", least($"u", min($"v").over(Window.partitionBy($"u"))))
        .filter($"v" > $"u")
        .select($"m".as("p"), $"v".as("c"), ($"m" =!= $"u").as("chgL"))
      // small-star: per larger endpoint c, the smaller neighbors and c
      // itself attach to m2 = min(p) (< every p and < c, so canonical).
      // The parent edge (m2, c) is exactly the surviving p == m2 row
      // (m2 is one of the p's by construction), so no ordered window is
      // needed; anyChgL keeps the group's change flag alive on it.
      val wC = Window.partitionBy($"c")
      val ss = ls
        .withColumn("m2", min($"p").over(wC))
        .withColumn("anyChgL", max($"chgL").over(wC))
      val leaves = ss.filter($"p" =!= $"m2")
        .select($"m2".as("p"), $"p".as("c"), lit(true).as("chg"))
      val parents = ss.filter($"p" === $"m2")
        .select($"m2".as("p"), $"c", $"anyChgL".as("chg"))
      // Note: the flag is "this round did rewrite work", not "the output
      // differs from the input" — a round whose OUTPUT is already the
      // final star forest can still raise flags (a parent edge carries
      // its group's anyChgL; duplicate emitted edges keep independent
      // flags), costing at most one extra identity round before the
      // fixpoint test reads 0. Deliberate: comparing output-vs-input
      // edge sets would add a join per round to save that single round.
      val flagged = leaves.unionByName(parents)
      changedAcc.reset()
      rowsAcc.reset()
      val enc = org.apache.spark.sql.Encoders.row(flagged.schema)
      e = materialize(flagged
        .map { r =>
          if (r.getBoolean(2)) changedAcc.add(1L)
          rowsAcc.add(1L) // pre-distinct row count → next round's bound
          r
        }(enc)
        .toDF("p", "c", "chg")
        .select($"p", $"c")
        .distinct()) // eager: the round's one job; fills the accumulators
      converged = changedAcc.value == 0L
      edgeBound = rowsAcc.value
      }
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"star contraction did not converge in $maxIterations rounds — " +
        "raise maxIterations")
    docs.select($"doc_id")
      .join(e.select($"c".as("doc_id"), $"p".as("cluster_id")), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
  }

  /** Exact single-task finish for a small edge set: min-root union-find
    * with path compression over the edges coalesced into ONE partition
    * (executor-side — nothing is collected to the driver), emitting the
    * same canonical star forest (min-id root, one (root, member) edge
    * per non-root member) the contraction converges to, so the caller's
    * label-extraction tail is path-independent. Memory is O(nodes) in
    * one task — the `localFinishEdges` bound is what keeps that small. */
  private def localStars(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select($"p", $"c").as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        // primitive open-addressing parent table: ~17 B per node in
        // flat arrays, vs the ~100+ B per entry a boxed map costs —
        // at the 1M-edge cutover the finishing task stays tens of MB
        val parent = new LongLongMap(1 << 16)
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
          var cur = x // path compression
          while (parent.getOrDefault(cur, cur) != cur) {
            val nxt = parent.getOrDefault(cur, cur); parent.put(cur, r); cur = nxt
          }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
          // keep both endpoints present as keys so every member of the
          // component is emitted below (a node that only ever WINS its
          // unions would otherwise never enter the map)
          parent.putIfAbsent(a, find(a)); parent.putIfAbsent(b, find(b))
        }
        val keys = parent.keysSnapshot()
        keys.iterator.map(x => (find(x), x)).filter { case (r, x) => r != x }
      }
      .toDF("p", "c")
  }

  /** Minimal open-addressing Long→Long map (linear probing,
    * power-of-two capacity, grow at ~0.6 load): the union-find parent
    * table for [[localStars]]. Flat primitive arrays — no boxing, no
    * per-entry objects — so the single finishing task's memory is
    * keys+values+occupancy ≈ 17 B per slot. */
  private[graft] final class LongLongMap(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity) - 1) << 1
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    private def slot(k: Long): Int = {
      // Fibonacci scramble so consecutive ids don't cluster the probe
      var i = ((k * -7046029254386353131L) >>> 40).toInt & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      i
    }
    def getOrDefault(k: Long, d: Long): Long = {
      val i = slot(k); if (used(i)) vals(i) else d
    }
    def put(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!used(i)) { used(i) = true; keys(i) = k; n += 1; maybeGrow() }
      val j = slot(k) // maybeGrow can move the slot
      vals(j) = v
    }
    def putIfAbsent(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!used(i)) { used(i) = true; keys(i) = k; vals(i) = v; n += 1; maybeGrow() }
    }
    private def maybeGrow(): Unit = if (n * 5L >= cap * 3L) {
      val (ok, ov, ou) = (keys, vals, used)
      cap <<= 1; mask = cap - 1; n = 0
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      used = new Array[Boolean](cap)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) {
          val s = slot(ok(i))
          used(s) = true; keys(s) = ok(i); vals(s) = ov(i); n += 1
        }
        i += 1
      }
    }
    def keysSnapshot(): Array[Long] = {
      val out = new Array[Long](n)
      var i = 0; var j = 0
      while (i < cap) { if (used(i)) { out(j) = keys(i); j += 1 }; i += 1 }
      out
    }
  }
}
