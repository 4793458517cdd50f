package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline surface: dedup, similarity search, text
  * analysis, multimodal plumbing (north-star extensions from SURVEY.md
  * §2.b). SQL-expressible ops carry a DuckDB oracle; the
  * probabilistic/stub ops (MinHash-LSH, SimHash, LSH-ANN, lang-id) are
  * rows-only here and pinned by ScalaTest specs instead.
  */
object DataPipeline {

  // -------------------------------------------------------------- dedup
  val dd1_exact_dedup = QueryDef.sqlChecked(
    "dd1_exact_dedup",
    """SELECT md5(text) AS h, count(*) AS n_copies, min(doc_id) AS keep_id
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin) { (s, d) =>
    Dedup.exact(Tables.documents(s, d))
  }

  val dd2_minhash_lsh = QueryDef.rowsOnly("dd2_minhash_lsh") { (s, d) =>
    Dedup.minhashLsh(Tables.documents(s, d))
  }

  val dd3_ngram_jaccard = QueryDef.sqlChecked(
    "dd3_ngram_jaccard",
    """WITH wl AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws
      |            FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i FROM wl),
      |sh AS (SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
      |       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |                  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT da, db, round(i*1.0/(sa.n + sb.n - i), 4) AS jaccard
      |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
      |WHERE 2*i >= (sa.n + sb.n - i)
      |ORDER BY da, db""".stripMargin) { (s, d) =>
    Dedup.ngramJaccard(Tables.documents(s, d))
  }

  val dd4_simhash = QueryDef.rowsOnly("dd4_simhash") { (s, d) =>
    Dedup.simhashPairs(Tables.documents(s, d))
  }

  val dd6_winnow_fragments = QueryDef.rowsOnly("dd6_winnow_fragments") { (s, d) =>
    Dedup.fragmentOverlap(Tables.documents(s, d))
  }

  val dd5_embedding_neardup = QueryDef.sqlChecked(
    "dd5_embedding_neardup",
    """SELECT a.vec_id AS va, b.vec_id AS vb,
      | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.45
      |ORDER BY va, vb""".stripMargin) { (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d))
  }

  // -------------------------------------------------- similarity search
  val ann_brute_topk = QueryDef.sqlChecked(
    "ann_brute_topk",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |sc AS (SELECT qid, vec_id, round(list_cosine_similarity(qv, v), 4) AS sim
      |       FROM q, e WHERE vec_id <> qid),
      |r AS (SELECT qid, vec_id, sim,
      |       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INTEGER) AS rnk
      |      FROM sc)
      |SELECT qid, rnk, vec_id, sim FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) {
    (s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
  }

  val ann_lsh_topk = QueryDef.rowsOnly("ann_lsh_topk") { (s, d) =>
    Similarity.lshTopK(Tables.embeddings(s, d), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
  }

  val ann_ivf_topk = QueryDef.rowsOnly("ann_ivf_topk") { (s, d) =>
    graft.operators.IvfSearch.ivfTopK(Tables.embeddings(s, d),
      queryIds = Seq(0L, 1L, 2L, 3L, 4L))
  }

  // ------------------------------------------------------ text analysis
  private val StopList = "['the','a','of','and','in','to','is']"

  val txt_quality = QueryDef.sqlChecked(
    "txt_quality",
    s"""WITH wl AS (SELECT doc_id, n_chars,
       |  list_filter(string_split(text,' '), x -> x <> '') AS ws FROM documents)
       |SELECT doc_id, n_chars,
       | CAST(len(ws) AS INTEGER) AS n_words,
       | round(CAST(n_chars AS DOUBLE)/len(ws), 4) AS chars_per_word,
       | round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)/len(ws), 4) AS avg_word_len,
       | CAST(len(list_filter(ws, w -> list_contains($StopList, w))) AS INTEGER) AS n_stop,
       | round(CAST(len(list_filter(ws, w -> list_contains($StopList, w))) AS DOUBLE)/len(ws), 4) AS stop_ratio,
       | round(CAST(len(list_filter(ws, w -> list_contains($StopList, w))) AS DOUBLE)/len(ws)*0.5
       |   + least(len(ws), 100)/100.0*0.5, 4) AS quality_score
       |FROM wl ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.quality(Tables.documents(s, d))
  }

  val txt_tokens = QueryDef.sqlChecked(
    "txt_tokens",
    """SELECT doc_id,
      | CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS INTEGER) AS ws_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS bpe_tokens,
      | round(CAST(n_chars AS DOUBLE)/len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')), 4) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.tokenCounts(Tables.documents(s, d))
  }

  val txt_fingerprint = QueryDef.sqlChecked(
    "txt_fingerprint",
    """WITH wl AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ws
      |            FROM documents)
      |SELECT doc_id,
      | CAST(list_reduce(
      |   list_concat([CAST(0 AS BIGINT)],
      |     list_transform(ws, w -> CAST(length(w)*31 + ascii(w) AS BIGINT))),
      |   (a, b) -> (a*131 + b) % 1000000007) AS BIGINT) AS fp
      |FROM wl ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.fingerprint(Tables.documents(s, d))
  }

  val txt_langid = QueryDef.rowsOnly("txt_langid") { (s, d) =>
    TextAnalysis.languageId(Tables.documents(s, d))
  }

  // --------------------------------------------------------- multimodal
  val mm_features = QueryDef.sqlChecked(
    "mm_features",
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      | CAST((octet_length(encode(text)) + 1023) // 1024 AS INTEGER) AS n_chunks,
      | upper(substr(hex(encode(text)), 1, 16)) AS head_hex
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    implicit val spark = s
    Multimodal.extractFeatures(Tables.documents(s, d))
      .toDF()
      .select("doc_id", "n_bytes", "n_chunks", "head_hex")
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(
    dd1_exact_dedup, dd2_minhash_lsh, dd3_ngram_jaccard, dd4_simhash,
    dd5_embedding_neardup, dd6_winnow_fragments, ann_brute_topk, ann_lsh_topk, ann_ivf_topk,
    txt_quality, txt_tokens, txt_fingerprint, txt_langid, mm_features)
}
