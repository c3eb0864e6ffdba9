package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate candidate pairs: turns the
  * pair list (d6/d8) into a per-document dedup decision — every doc gets
  * a cluster representative (the minimum doc_id reachable through the
  * similarity graph), and "keep one per cluster" falls out.
  *
  * Algorithm: min-label propagation WITH POINTER JUMPING: each round
  * every vertex (1) adopts the minimum label among itself and its
  * neighbors, then (2) follows its provisional label one more hop
  * (label := label-of-label) — so label paths halve every round and
  * convergence is O(log diameter) instead of O(diameter): a
  * 1000-link near-dup chain (boilerplate drift) converges in ~10
  * rounds, not 1000. Each round is a handful of shuffles keyed on
  * doc_id/label — no driver-side graph, works at any vertex count.
  * The convergence check is FUSED into the round: the change flag is
  * computed inside the same projection and counted by the job that
  * materializes the round's labels, so each round is exactly one
  * Spark job.
  *
  * Fixpoint correctness: change==0 means every edge has equal labels
  * on both ends (the neighbor-min step, applied in both edge
  * directions, is stationary) and the label function is idempotent
  * (the jump is stationary) — a uniform per-component label that is a
  * member of the component and can only be its minimum doc_id, since
  * the minimum never adopts a larger value.
  */
object DedupClusters {

  /** @param docs   one row per document, column `doc_id`
    * @param pairs  undirected edges: columns `a_id`, `b_id`
    * @return (doc_id, cluster_id) — cluster_id = min doc_id in component
    * @throws IllegalStateException if the iteration cap is hit before
    *         convergence: returning silently would hand the caller
    *         split clusters (a long near-dup chain would dedup wrong).
    *         With pointer jumping the default cap of 10 covers
    *         component diameters into the hundreds; raise it for
    *         pathological million-link chains. */
  def assign(docs: DataFrame, pairs: DataFrame, maxIterations: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // localCheckpoint (not persist): iterative joins grow the logical
    // plan exponentially in the round count — each round references the
    // previous labels twice — and re-analysis + cache lookups over that
    // tree dwarf the actual compute. Checkpointing truncates the lineage
    // to the materialized partitions each round. (Not fault-tolerant:
    // on a cluster with lossy executors use reliable checkpointing.)
    val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
      .localCheckpoint()
    var labels = docs.select($"doc_id", $"doc_id".as("cluster_id")).localCheckpoint()
    // The change count rides a task-side accumulator populated by the
    // SAME job that materializes the round's labels (the eager
    // checkpoint), so each round is exactly one job and the driver never
    // runs a separate blocking count action. Task retries can only
    // inflate a nonzero count, and convergence tests == 0, so the
    // at-least-once accumulator semantics are safe here.
    val changedAcc = spark.sparkContext.longAccumulator("graft-dedup-changed")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // (1) each vertex adopts the min label among itself and its neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy($"src".as("doc_id"))
        .agg(min($"cluster_id").as("nbr_min"))
      val step = labels.join(neighborMin, Seq("doc_id"), "left")
        .select($"doc_id", $"cluster_id".as("old_id"),
          least($"cluster_id", coalesce($"nbr_min", $"cluster_id")).as("c1"))
      // (2) pointer jumping: follow the provisional label one more hop
      // (labels are doc ids, so the hop table is step itself re-keyed);
      // labels only ever decrease within the component, so the jump is
      // monotone and safe
      val hop = step.select($"doc_id".as("hop_key"), $"c1".as("hop_val"))
      val updated = step.join(hop, step("c1") === hop("hop_key"), "left")
        .select(step("doc_id"),
          least($"c1", coalesce($"hop_val", $"c1")).as("cluster_id"),
          (least($"c1", coalesce($"hop_val", $"c1")) =!= $"old_id").as("chg"))
      changedAcc.reset()
      val enc = org.apache.spark.sql.Encoders.row(updated.schema)
      val next = updated
        .map { r => if (r.getBoolean(2)) changedAcc.add(1L); r }(enc)
        .localCheckpoint() // eager: the round's one job; fills the accumulator
      labels = next.select($"doc_id", $"cluster_id")
      converged = changedAcc.value == 0L
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge in $maxIterations rounds — " +
        "component diameter exceeds the cap; raise maxIterations")
    labels
  }
}
