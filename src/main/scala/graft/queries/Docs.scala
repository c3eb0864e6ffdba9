package graft.queries

import graft.Tables
import graft.functions.{Text, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.4) over `documents` and
  * `embeddings` — dedup, text analysis, similarity search.
  *
  * Oracle parity notes: DuckDB regexp_replace needs the 'g' flag to match
  * Spark's global-by-default semantics; list folds are double-accumulated
  * on both sides; thresholds sit far from any pair's cosine so last-ulp
  * noise can't flip membership.
  */
object Docs {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "embeddings")

  /** Oracle prelude: normalized document text. */
  private val normCte =
    """WITH nd AS (SELECT doc_id, lang, source,
      |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm, text
      |  FROM documents)""".stripMargin

  /** Oracle prelude: embeddings with exact double norms. */
  private val nvCte =
    """WITH nv AS (SELECT vec_id, label, embedding,
      |  sqrt(list_sum(list_transform(range(len(embedding)),
      |       i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)))) AS nrm
      |  FROM embeddings)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(len($a)),
       |    i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)))""".stripMargin

  private val stopwords = Seq("the", "a")

  val queries: Seq[GraftQuery] = Seq(

    // ---- d1: exact dedup by normalized-content fingerprint. Scale: the
    // shuffle key is the 128-bit hash, never the document body; payload
    // columns prune to (fp, doc_id) before the exchange.
    GraftQuery.sql("d1_dedup_exact",
      s"""$normCte
         |SELECT md5(norm) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM nd GROUP BY md5(norm) ORDER BY fp""".stripMargin) { (s, dir) =>
      import s.implicits._
      docs(s, dir)
        .select(Text.fingerprint($"text").as("fp"), $"doc_id")
        .groupBy($"fp")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"fp")
    },

    // ---- d2: per-document stable fingerprint + normalized length.
    GraftQuery.sql("d2_fingerprint",
      s"""$normCte
         |SELECT doc_id, md5(norm) AS fp, CAST(length(norm) AS BIGINT) AS n_chars_norm
         |FROM nd ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", Text.fingerprint($"text").as("fp"),
          length(Text.normalize($"text")).cast("long").as("n_chars_norm"))
        .orderBy($"doc_id")
    },

    // ---- d3: token counting — whitespace tokens and a BPE-ish regex
    // token proxy (letter runs / digit runs / punctuation marks).
    GraftQuery.sql("d3_token_count",
      s"""$normCte
         |SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(norm, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
         |FROM nd ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      docs(s, dir)
        .select($"doc_id",
          Text.wsTokenCount($"text").as("ws_tokens"),
          Text.bpeTokenCount($"text").as("bpe_tokens"))
        .orderBy($"doc_id")
    },

    // ---- d4: quality scoring (length saturation + punctuation density +
    // stopword ratio), the web-corpus filter heuristic. Unrounded on both
    // sides: both engines evaluate the identical IEEE double chain, while
    // engine-native ROUND diverges at .00005 boundaries (r1 ADVICE).
    GraftQuery.sql("d4_quality_score",
      s"""$normCte
         |SELECT doc_id,
         |  LEAST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) / 100.0, 1.0) * 0.3
         |  + (1.0 - CAST(length(regexp_replace(norm, '[a-z0-9 ]', '', 'g')) AS BIGINT)
         |           / CAST(length(norm) AS BIGINT)) * 0.3
         |  + (CAST(len(list_filter(string_split(norm, ' '), t -> t IN ('the', 'a'))) AS BIGINT)
         |     / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)) * 0.4
         |  AS quality
         |FROM nd ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", Text.qualityScore($"text", stopwords).as("quality"))
        .orderBy($"doc_id")
    },

    // ---- d5: language ID by marker-token voting with a deterministic
    // alphabetical tie-break; reported as a lang×pred confusion matrix.
    GraftQuery.sql("d5_lang_id",
      s"""$normCte,
         |scores AS (SELECT doc_id, lang,
         |  len(list_filter(string_split(norm, ' '), t -> t IN ('das', 'der', 'die', 'und'))) AS s_de,
         |  len(list_filter(string_split(norm, ' '), t -> t IN ('and', 'of', 'the'))) AS s_en,
         |  len(list_filter(string_split(norm, ' '), t -> t IN ('el', 'los', 'que', 'y'))) AS s_es,
         |  len(list_filter(string_split(norm, ' '), t -> t IN ('et', 'la', 'le', 'les'))) AS s_fr,
         |  len(list_filter(string_split(norm, ' '), t -> t IN ('de_zh_marker'))) AS s_zh
         |  FROM nd),
         |pred AS (SELECT lang, CASE
         |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |  WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted
         |  FROM scores)
         |SELECT lang, predicted, COUNT(*) AS n FROM pred
         |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin) { (s, dir) =>
      import s.implicits._
      val markers = Seq(
        "de" -> Seq("das", "der", "die", "und"),
        "en" -> Seq("and", "of", "the"),
        "es" -> Seq("el", "los", "que", "y"),
        "fr" -> Seq("et", "la", "le", "les"),
        "zh" -> Seq("de_zh_marker"))
      // Tokenize ONCE and score via explode + conditional hash aggregate.
      // The r1 form (5 filter-HOF columns feeding a CASE) re-evaluated the
      // regex normalize+split per CASE reference — interpreted lambdas,
      // ~49 s at sf0.1. This shape is one codegen'd pass + a partial
      // (map-side combined) aggregate keyed on doc_id.
      val tok = docs(s, dir).select($"doc_id", $"lang",
        explode_outer(Text.tokens($"text")).as("t"))
      val scoreCols = markers.map { case (l, ws) =>
        sum(when($"t".isin(ws.map(lit(_)): _*), 1L).otherwise(0L)).as(s"s_$l")
      }
      val scored = tok.groupBy($"doc_id", $"lang")
        .agg(scoreCols.head, scoreCols.tail: _*)
      val predicted = scored.withColumn("predicted",
        when($"s_de" >= $"s_en" && $"s_de" >= $"s_es" && $"s_de" >= $"s_fr" && $"s_de" >= $"s_zh", "de")
          .when($"s_en" >= $"s_es" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_zh", "en")
          .when($"s_es" >= $"s_fr" && $"s_es" >= $"s_zh", "es")
          .when($"s_fr" >= $"s_zh", "fr")
          .otherwise("zh"))
      predicted.groupBy($"lang", $"predicted").agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    },

    // ---- d9: cosine-threshold near-duplicate pairs. Brute-force O(n²)
    // pair generation here (correctness baseline); the 100TB path is the
    // LSH-bucketed variant (d6/d11) whose candidates this query verifies.
    GraftQuery.sql("d9_embedding_neardup",
      s"""$nvCte
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ROUND(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
         |FROM nv a JOIN nv b ON a.vec_id < b.vec_id
         |WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val nv = embs(s, dir)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
      // The pair join is a broadcast nested loop; the probe side arrives as
      // one parquet split, so spread it across cores (at cluster scale this
      // is the map-side parallelism of the O(n²/p) block comparison).
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val a = nv.select($"vec_id".as("a_id"), $"embedding".as("ea"), $"nrm".as("na"))
        .repartition(p)
      val b = nv.select($"vec_id".as("b_id"), $"embedding".as("eb"), $"nrm".as("nb"))
      a.join(b, $"a_id" < $"b_id")
        .withColumn("cos", Vectors.cosineWithNorms($"ea", $"eb", $"na", $"nb"))
        .filter($"cos" >= 0.4)
        .select($"a_id", $"b_id", round($"cos", 6).as("cos"))
        .orderBy($"a_id", $"b_id")
    },

    // ---- d10: brute-force cosine top-k (k=5) for a query subset — the
    // exact baseline ANN recall is measured against (d11 is the scale
    // path). TakeOrdered per query via window row_number.
    GraftQuery.sql("d10_ann_topk",
      s"""$nvCte,
         |pairs AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cos
         |  FROM nv q JOIN nv c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (SELECT q_id, neighbor_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM pairs)
         |SELECT q_id, neighbor_id, ROUND(cos, 6) AS cos, rk
         |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val nv = embs(s, dir)
        .select($"vec_id", $"embedding", Vectors.norm($"embedding").as("nrm"))
      val p = s.conf.get("spark.sql.shuffle.partitions").toInt
      val q = nv.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"embedding".as("eq"), $"nrm".as("nq"))
      val c = nv.select($"vec_id".as("neighbor_id"), $"embedding".as("ec"), $"nrm".as("nc"))
        .repartition(p)
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"neighbor_id")
      q.join(c, $"q_id" =!= $"neighbor_id")
        .withColumn("cos", Vectors.cosineWithNorms($"eq", $"ec", $"nq", $"nc"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"q_id", $"neighbor_id", round($"cos", 6).as("cos"), $"rk")
        .orderBy($"q_id", $"rk")
    }
  )
}
