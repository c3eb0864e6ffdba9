package graft

import org.apache.spark.sql.functions._

/** The session memos (KMeans.centroidCache under both quantization
  * modes) must be pure caches: a cached fit is bit-identical to a
  * direct fit, a hit never rebuilds the input plan, and distinct keys
  * never alias. BpeSpec covers the same contract for the BPE trainer;
  * the edge/pair memos are covered end-to-end by the oracle sweep
  * (every consumer hash-matches DuckDB through the memoized path). */
class MemoParitySpec extends SparkSpec {

  test("KMeans.fitCached equals KMeans.fit, and a hit skips the Lloyd rounds") {
    import spark.implicits._
    val embs = Tables.load(spark, Sf0001, "embeddings")
    val direct = graft.operators.KMeans.fit(spark, embs, k = 4, iters = 2)
      .orderBy($"vec_id").collect().toSeq
    val key = s"memospec-kmeans-$Sf0001"
    val cached = graft.operators.KMeans
      .fitCached(spark, embs, k = 4, iters = 2, corpusKey = key)
      .orderBy($"vec_id").collect().toSeq
    assert(cached === direct, "cached fit must be bit-identical to direct fit")
    // the assignment pass re-executes per call (it reads embs), but the
    // centroid rounds must come from the memo: a second call is cheap
    // and, more importantly, deterministic against the first
    val again = graft.operators.KMeans
      .fitCached(spark, embs, k = 4, iters = 2, corpusKey = key)
      .orderBy($"vec_id").collect().toSeq
    assert(again === direct)
  }

  test("AnnIvf.centroidsCached equals AnnIvf.centroids; mode and key are " +
      "part of the cache identity") {
    val embs = Tables.load(spark, Sf0001, "embeddings")
    val direct = graft.operators.AnnIvf.centroids(spark, embs, numClusters = 4)
    val key = s"memospec-ivf-$Sf0001"
    val cached = graft.operators.AnnIvf
      .centroidsCached(spark, embs, numClusters = 4, iters = 1, corpusKey = key)
    assert(cached.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq,
      "cached IVF centroids must equal a direct build")
    // a hit must not evaluate the embeddings argument (by-name thunk)
    val hit = graft.operators.AnnIvf.centroidsCached(spark,
      sys.error("cache miss: embeddings plan rebuilt"),
      numClusters = 4, iters = 1, corpusKey = key)
    assert(hit.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
    // the PLAIN-lattice mode under the same (k, iters) must not alias
    // the normalized-lattice entry: KMeans.fitCached seeds from
    // unnormalized quantization, so its centroids differ
    import spark.implicits._
    val plainKey = key
    graft.operators.KMeans.fitCached(spark, embs, k = 4, iters = 1,
      corpusKey = plainKey).collect() // populates plain|key|4|1
    val ivfAgain = graft.operators.AnnIvf.centroidsCached(spark, embs,
      numClusters = 4, iters = 1, corpusKey = plainKey)
    assert(ivfAgain.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq,
      "ivfnorm and plain cache spaces must not alias under the same key")
  }
}
