package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (SURVEY.md §2.4 d51) — the memory-scale
  * path for similarity search: vectors compress to `m` small codes
  * (here 8 codes of 4 bits' worth each — 32× smaller than the 64-dim
  * float vector), and search scans CODES against a per-query lookup
  * table instead of touching vectors (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search").
  *
  * Everything runs on KMeans' 2^-20 integer lattice, so training,
  * encoding, and the ADC scan are bit-deterministic (no FP summation
  * order anywhere):
  *   - train: per subspace j, quantized-Lloyd over the 8-dim slices —
  *     all m subspaces advance in ONE pass per round (the per-round
  *     update shuffles m·k·subDim (sum,count) cells, never vectors);
  *     seeds are the k lowest-vec_id subvectors (KMeans' discipline).
  *   - encode: argmin over the m×k codebook literal, a map-side
  *     projection with no Exchange (AnnIvf's discipline).
  *   - search (asymmetric ADC): each query keeps its EXACT lattice
  *     subvectors; the m×k table of query-to-codeword distances is
  *     precomputed driver-side (m·k longs per query) and rides into
  *     tasks as a literal; a corpus row costs m array lookups + m adds.
  *
  * At 100 TB: the codes table is the only thing scanned (8 bytes per
  * vector vs 256), the LUT literal is O(queries·m·k) longs broadcast
  * with the task binary, and the scan is embarrassingly parallel; the
  * top-k window partitions by query id (compose with d11's IVF routing
  * for query counts beyond literal size). Recall-vs-exact is pinned in
  * Wave7Spec at the gate SF.
  */
object PqAnn {

  /** Codebooks: cb(j)(code) = lattice centroid of subspace j. */
  type Codebooks = Array[Array[Array[Long]]]

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** The native assignment expression over a flattened codebook literal
    * (expressions/PqExpression.scala — one fused codegen loop; the HOF
    * form of the same argmin ran interpreted and was the d51 hot spot). */
  private def codesCol(q: Column, cb: Codebooks): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    val flat = cb.flatMap(_.flatMap(_.toSeq)).toSeq
    call_function("pq_codes", q, typedLit(flat), lit(cb.length), lit(cb.head.length))
  }

  /** (vec_id, codes array<int>) — one map-side projection, no Exchange. */
  def encode(embs: DataFrame, cb: Codebooks): DataFrame = {
    import embs.sparkSession.implicits._
    embs.select($"vec_id", KMeans.quantize($"embedding").as("q"))
      .select($"vec_id", codesCol($"q", cb).as("codes"))
  }

  /** Train m codebooks of k codewords with `iters` joint Lloyd rounds. */
  def train(spark: SparkSession, embs: DataFrame, m: Int, k: Int,
      iters: Int): Codebooks = {
    import spark.implicits._
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subDim = dim / m
    // seeds: the k lowest-vec_id vectors, sliced per subspace
    val seedRows = embs.orderBy($"vec_id").limit(k)
      .select(KMeans.quantize($"embedding").as("q"))
      .collect().map(_.getSeq[Long](0).toArray)
    require(seedRows.length == k, s"need >= $k vectors to seed")
    var cb: Codebooks = Array.tabulate(m)(j =>
      seedRows.map(_.slice(j * subDim, (j + 1) * subDim)))

    val qDf = embs.select(KMeans.quantize($"embedding").as("q"))
    for (_ <- 1 to iters) {
      // all m assignments in one native pq_codes call, then (j, code, pos)
      // cells: the round's only exchange carries m·k·subDim longs
      val cells = qDf
        .select($"q", posexplode(codesCol($"q", cb)).as(Seq("j", "cid")))
        .select($"j", $"cid",
          posexplode(slice($"q", $"j" * lit(subDim) + 1, lit(subDim)))
            .as(Seq("pos", "v")))
        .groupBy($"j", $"cid", $"pos")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      cells.foreach { r =>
        val (j, cid, pos) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val (s, n) = (r.getLong(3), r.getLong(4))
        next(j)(cid)(pos) = (2 * s + n) / (2 * n) // round-half-up, all >= 0
      }
      cb = next
    }
    cb
  }

  /** Asymmetric-distance top-k: queries (given as exact rows of the
    * corpus, `queryPred`) scan only the codes table. Returns
    * (q_id, neighbor_id, adc_d2, rk). */
  def topK(spark: SparkSession, embs: DataFrame, cb: Codebooks,
      queryPred: Column, k: Int): DataFrame = {
    import spark.implicits._
    val m = cb.length
    val subDim = cb.head.head.length
    // per-query LUT, driver-side: m·k exact lattice distances each
    val qRows = embs.filter(queryPred).select($"vec_id",
        KMeans.quantize($"embedding").as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    require(qRows.nonEmpty, "empty query set")
    val lutLit = array(qRows.map { case (qid, q) =>
      struct(lit(qid).as("q_id"),
        typedLit((0 until m).map { j =>
          val qj = q.slice(j * subDim, (j + 1) * subDim)
          cb(j).map(c => qj.zip(c).map { case (a, b) =>
            (a - b) * (a - b) }.sum).toSeq
        }).as("lut"))
    }.toIndexedSeq: _*)
    val adc = aggregate(
      zip_with($"ql.lut", $"codes",
        (luts, code) => element_at(luts, code + 1)),
      lit(0L), (acc, v) => acc + v)
    val w = Window.partitionBy($"q_id").orderBy($"adc_d2".asc, $"neighbor_id".asc)
    encode(embs, cb)
      .select($"vec_id".as("neighbor_id"), $"codes", explode(lutLit).as("ql"))
      .select($"ql.q_id".as("q_id"), $"neighbor_id", adc.as("adc_d2"))
      .filter($"q_id" =!= $"neighbor_id")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .orderBy($"q_id", $"rk")
  }

  /** ADC+R (the standard PQ pipeline): the code-only scan produces a
    * `shortlist`-deep candidate set per query, and only those rows are
    * re-ranked by EXACT lattice L2 — so the expensive scan never touches
    * vectors, and full vectors are fetched for shortlist·queries rows
    * total. Returns (q_id, neighbor_id, d2, rk) with d2 exact. */
  def topKReranked(spark: SparkSession, embs: DataFrame, cb: Codebooks,
      queryPred: Column, k: Int, shortlist: Int): DataFrame = {
    import spark.implicits._
    val short = topK(spark, embs, cb, queryPred, shortlist)
      .select(col("q_id"), col("neighbor_id"))
    val qv = embs.filter(queryPred)
      .select(col("vec_id").as("q_id"), KMeans.quantize(col("embedding")).as("qq"))
    val nv = embs.select(col("vec_id").as("neighbor_id"),
      KMeans.quantize(col("embedding")).as("nq"))
    val w = Window.partitionBy($"q_id").orderBy($"d2".asc, $"neighbor_id".asc)
    short.join(broadcast(qv), "q_id").join(nv, "neighbor_id")
      .withColumn("d2", dist2($"qq", $"nq"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"q_id", $"neighbor_id", $"d2", $"rk")
      .orderBy($"q_id", $"rk")
  }
}
