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

  test("CorpusId: an in-place corpus rewrite changes the key, so a memo " +
      "keyed on it MISSES instead of serving stale rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corpusid")
      .toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val k1 = graft.util.CorpusId.key(dir)
    assert(k1 === graft.util.CorpusId.key(dir),
      "the key must be stable while the corpus is untouched")
    val memo = new graft.util.RowMemo(maxRows = 1000)
    def live = spark.read.parquet(dir)
    val before = memo.getOrBuild(spark, graft.util.CorpusId.key(dir), live)
      .agg(sum($"id")).as[Long].head()
    assert(before === 3L)
    // rewrite IN PLACE: same dir string, different data — the r11 keys
    // (bare dir string) would keep serving the stale memoized rows here
    Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    assert(graft.util.CorpusId.key(dir) !== k1,
      "the fingerprint must change on an in-place rewrite")
    val after = memo.getOrBuild(spark, graft.util.CorpusId.key(dir), live)
      .agg(sum($"id")).as[Long].head()
    assert(after === 60L,
      "the memo must miss after the rewrite (a stale hit would return 3)")
  }

  test("CorpusId: alias paths of one dir share a key; an unreadable dir " +
      "yields unique never-matching keys (rebuild, never stale)") {
    val k = graft.util.CorpusId.key(Sf0001)
    assert(graft.util.CorpusId.key(Sf0001 + "/") === k,
      "canonicalization must fold alias paths onto one memo entry")
    val missing = "/root/testdata/no-such-dir"
    assert(graft.util.CorpusId.key(missing) !== graft.util.CorpusId.key(missing),
      "a degraded key must never match — forcing a rebuild is safe, " +
        "serving a possibly-stale entry is not")
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
