package graft

import graft.functions.PortableHash
import graft.operators.{Dedup, Similarity}

/** The DuckDB oracle-SQL registry: for every `SparkEntry.queries` entry, an
  * equivalent ANSI/DuckDB SQL statement over the same parquet tables. The
  * driver runs these in DuckDB and compares rows/schema/hash against the
  * Spark results — this file IS the correctness contract's other half.
  *
  * Split out of `SparkEntry` (which keeps the query builders) purely for
  * navigability: the two faces share only a handful of parameter tables
  * (`SparkEntry.stratifiedRates`, the BM25 query list, the advisor layout
  * grid, the quality-ensemble weights), imported below. Where an oracle
  * must replay a Spark-side hash/permutation family bit-for-bit, the SQL is
  * GENERATED from the same Scala constants the Spark plan uses
  * ([[graft.functions.PortableHash.md5Hash60Sql]],
  * [[graft.operators.Similarity.jlSigns]], ...) — that generation is the
  * replay guarantee, not a copy of literals that could drift.
  */
private[graft] object OracleSql {
  import SparkEntry.{advisorLayouts, advisorProbes, bm25Queries,
    hashedWeightUnits, profileCols, qualityEnsemble, stratifiedRates}

  private lazy val langIdSql: String = {
    def hits(w: String) =
      s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ' '))) / ${w.length + 1} AS BIGINT)"
    def langHits(ws: Seq[String]) = ws.map(hits).mkString(" + ")
    val en = langHits(Seq("the", "and", "of"))
    val es = langHits(Seq("el", "la", "de"))
    val de = langHits(Seq("der", "und", "die"))
    s"""SELECT doc_id, lang, en_hits, es_hits, de_hits,
       |  CASE WHEN es_hits > en_hits AND es_hits >= de_hits THEN 'es'
       |       WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
       |       ELSE 'en' END AS predicted_lang
       |FROM (SELECT doc_id, lang, $en AS en_hits, $es AS es_hits, $de AS de_hits
       |      FROM documents)""".stripMargin
  }

  /** Full q89 Gopher-rules SELECT minus presentation sort (feeds q89 and
    * the q153 agreement oracle). */
  private lazy val gopherRulesSql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS BIGINT) AS n_words,
      |    CAST(length(array_to_string(tk, '')) AS DOUBLE) / len(tk) AS mean_word_len,
      |    CAST(CAST((length(text) - length(replace(text, '#', ''))) / 1 AS BIGINT)
      |       + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
      |       AS DOUBLE) / len(tk) AS symbol_ratio,
      |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      |      / len(tk) AS alpha_frac,
      |    CAST((SELECT SUM((length(p) - length(replace(p, ' ' || w || ' ', '')))
      |                     // (length(w) + 2))
      |          FROM (SELECT ' ' || array_to_string(tk, ' ') || ' ' AS p),
      |               unnest(['the','be','to','of','and','that','have','with']) AS s(w))
      |      AS BIGINT) AS stop_hits
      |  FROM d)
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
      |  n_words >= 50 AND n_words <= 100000 AS words_ok,
      |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS word_len_ok,
      |  symbol_ratio <= 0.1 AS symbol_ok,
      |  alpha_frac >= 0.8 AS alpha_ok,
      |  stop_hits >= 2 AS stop_ok,
      |  (n_words >= 50 AND n_words <= 100000)
      |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
      |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2
      |    AS pass
      |FROM m""".stripMargin

  /** Full q76 curation-gate SELECT minus presentation sort (feeds q76 and
    * the q153/q154 gate-diagnostic oracles). */
  private lazy val curationGateSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
       |uni AS (SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_token_count
       |        FROM tc GROUP BY 1),
       |d2 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |       FROM documents),
       |bg0 AS (
       |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
       |  FROM d2, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)
       |  WHERE len(w) >= 2
       |  UNION ALL
       |  SELECT doc_id, array_to_string(w, ' ') FROM d2 WHERE len(w) < 2),
       |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
       |bi AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_count
       |       FROM bc GROUP BY 1),
       |rep AS (
       |  SELECT doc_id,
       |    (CAST(top_token_count AS DOUBLE) / n_tokens > CAST(0.1 AS DOUBLE)
       |     OR CAST(top_bigram_count AS DOUBLE) / n_bigrams > CAST(0.05 AS DOUBLE))
       |      AS repetitive
       |  FROM uni JOIN bi USING (doc_id)),
       |lid AS (SELECT doc_id, predicted_lang = lang AS lang_match
       |        FROM ($langIdSql)),
       |dd AS (SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
       |       FROM documents),
       |th AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25 FROM dd GROUP BY lang),
       |len AS (SELECT doc_id, n_chars >= p25 AS length_ok
       |        FROM dd JOIN th USING (lang))
       |SELECT doc_id, repetitive, lang_match, length_ok,
       |  (NOT repetitive AND lang_match AND length_ok) AS keep
       |FROM rep JOIN lid USING (doc_id) JOIN len USING (doc_id)""".stripMargin

  /** Shared winnowing CTE chain (k=4, w=4): per-doc token lists `d`, gram
    * hashes `g`, the rightmost-min window encoding `w`, and the selected
    * fingerprint set `sel(doc_id, mc)` with `mc = hash·10⁹ + (10⁹−1−pos)`
    * — HUGEINT-exact replay of `operators/Winnowing` (feeds q151/q152). */
  private lazy val winnowSelCte: String = {
    val gramHash = PortableHash.md5Hash60Sql("array_to_string(t[i:i+3], ' ')")
    s"""d AS (SELECT doc_id, source,
       |        string_split_regex(trim(lower(text)), '\\s+') AS t
       |      FROM documents),
       |g AS (SELECT doc_id, i AS p, $gramHash AS h
       |      FROM d, unnest(generate_series(1, len(t) - 3)) AS u(i)
       |      WHERE len(t) >= 4),
       |w AS (SELECT doc_id, p,
       |        min(CAST(h AS HUGEINT) * 1000000000 + (999999999 - p))
       |          OVER (PARTITION BY doc_id ORDER BY p
       |                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mc,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY p) AS j,
       |        count(*) OVER (PARTITION BY doc_id) AS gc
       |      FROM g),
       |sel AS (SELECT DISTINCT doc_id, mc FROM w WHERE j <= greatest(gc - 3, 1))""".stripMargin
  }

  /** Shared CTE body replaying the portable minhash pipeline in DuckDB SQL —
    * md5Hash60 shingle hashes, 32 affine permutations, band CSV keys, the
    * (2, maxBucket) bucket-size gate (feeds q18 and q47). Prefix-
    * parameterized so q241 can compose it next to the image CTE family
    * (both define a `banded` otherwise). */
  private def minhashPipelineCtes(p: String): String = {
    val n = 32; val rpb = 8; val bands = n / rpb
    val mins = (0 until n)
      .map(i => s"min(${PortableHash.affine31Sql(i, "h")}) AS m$i").mkString(",\n    ")
    val sigList = (0 until n).map(i => s"m$i").mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val csv = (0 until rpb).map(r => s"m${b * rpb + r}").mkString(", ")
      s"SELECT id, [$sigList] AS sig, $b AS bno, concat_ws(',', $csv) AS bk FROM ${p}sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""${p}toks AS (
       |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |${p}sh AS (
       |  SELECT id, array_to_string(tk[u.i + 1 : u.i + 2], ' ') AS s
       |  FROM ${p}toks, unnest(range(greatest(len(tk) - 1, 1))) AS u(i)),
       |${p}h AS (SELECT id, ${PortableHash.md5Hash60Sql("s")} AS h FROM ${p}sh),
       |${p}sig AS (SELECT id, $mins FROM ${p}h GROUP BY id),
       |${p}banded AS (
       |  $bandSelects),
       |${p}sized AS (
       |  SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz FROM ${p}banded)""".stripMargin
  }
  private lazy val minhashPipelineCte: String = minhashPipelineCtes("")

  /** q128 oracle: the q18 signature pipeline generalized over
    * rows-per-band (4/8/16 → 8/4/2 bands over the same 32 permutations),
    * composed with q113's brute-force truth at 3-gram Jaccard >= 0.7 —
    * the oracle shares the hash family with the Spark side (that IS the
    * replay guarantee) but derives truth and recall independently. */
  private lazy val lshRecallOracleSql: String = {
    val n = 32
    val mins = (0 until n)
      .map(i => s"min(${PortableHash.affine31Sql(i, "h")}) AS m$i")
      .mkString(",\n    ")
    def bandCtes(rpb: Int): String = {
      val bands = n / rpb
      val bandSelects = (0 until bands).map { b =>
        val csv = (b * rpb until (b + 1) * rpb).map(r => s"m$r").mkString(", ")
        s"SELECT id, $b AS bno, concat_ws(',', $csv) AS bk FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      s"""banded$rpb AS (
         |  $bandSelects),
         |sized$rpb AS (
         |  SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz
         |  FROM banded$rpb),
         |cand$rpb AS (
         |  SELECT DISTINCT a.id AS ia, b.id AS ib
         |  FROM sized$rpb a JOIN sized$rpb b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000)""".stripMargin
    }
    val per = Seq(4, 8, 16).map(bandCtes).mkString(",\n")
    val stats = Seq(4, 8, 16).map { rpb =>
      s"""SELECT $rpb AS rpb, ${n / rpb} AS nbands,
         |  (SELECT COUNT(*) FROM truth) AS n_true,
         |  (SELECT COUNT(*) FROM cand$rpb) AS n_candidates,
         |  (SELECT COUNT(*) FROM cand$rpb c
         |   JOIN truth t ON t.ia = c.ia AND t.ib = c.ib) AS n_caught"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT id, array_to_string(tk[u.i + 1 : u.i + 3], ' ') AS s
       |  FROM toks, unnest(range(greatest(len(tk) - 2, 1))) AS u(i)),
       |h AS (SELECT id, ${PortableHash.md5Hash60Sql("s")} AS h FROM sh),
       |sig AS (SELECT id, $mins FROM h GROUP BY id),
       |shd AS (SELECT DISTINCT id, s FROM sh),
       |counts AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY 1),
       |inter AS (
       |  SELECT a.id AS ia, b.id AS ib, CAST(count(*) AS BIGINT) AS m
       |  FROM shd a JOIN shd b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2),
       |truth AS (
       |  SELECT ia, ib FROM inter
       |  JOIN counts ca ON ca.id = ia JOIN counts cb ON cb.id = ib
       |  WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.7 AS DOUBLE)),
       |$per
       |SELECT CAST(rpb AS BIGINT) AS rows_per_band,
       |  CAST(nbands AS BIGINT) AS bands,
       |  CAST(n_true AS BIGINT) AS n_true,
       |  CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_caught AS BIGINT) AS n_caught,
       |  CAST(n_caught AS DOUBLE) / n_true AS recall
       |FROM ($stats) ORDER BY rows_per_band""".stripMargin
  }

  /** q130/q132 oracles: full PQ replay — per-subspace squared distances
    * as the same left-associated 8-term chains, code assignment by
    * (dist, cid) row_number, ADC as the same left-associated lookup sum,
    * recall vs the exact cosine top-5 (q122's fullk pattern). With
    * `ivf = true` the ADC scan is additionally routed through q17's cell
    * assignment/probing CTEs (cosine argmax, nprobe = 4 of 16). */
  private lazy val pqRecallOracleSql: String = pqOracle(ivf = false)
  private lazy val ivfPqRecallOracleSql: String = pqOracle(ivf = true)
  private def pqOracle(ivf: Boolean): String = {
    val m = 8; val sub = 8; val kk = 16; val k = 5
    def dist(v: String, c: String, mi: Int): String =
      (0 until sub).map { j =>
        val i = mi * sub + j + 1
        s"(CAST($v[$i] AS DOUBLE) - CAST($c[$i] AS DOUBLE)) * " +
          s"(CAST($v[$i] AS DOUBLE) - CAST($c[$i] AS DOUBLE))"
      }.mkString(" + ")
    val cdCols = (0 until m).map(mi => s"${dist("e.embedding", "c.cvec", mi)} AS d$mi").mkString(",\n    ")
    val codeCtes = (0 until m).map { mi =>
      s"""codes_$mi AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d$mi, cid) AS rn FROM cd)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until m)
      .map(mi => s"JOIN codes_$mi c$mi USING (vec_id)").mkString("\n  ")
    val codeSel = (0 until m).map(mi => s"c$mi.cid AS c$mi").mkString(", ")
    val dtCols = (0 until m).map(mi => s"${dist("q.embedding", "c.cvec", mi)} AS dq$mi").mkString(",\n    ")
    // pivot dt to one row per query (cid-ordered lookup arrays) BEFORE the
    // ADC join — a naive 8-way chained join on (cid, qid) hands the
    // planner a 16^7-per-query reorder trap
    val dtqCols = (0 until m)
      .map(mi => s"array_agg(dq$mi ORDER BY cid) AS a$mi").mkString(",\n    ")
    val adSum = (0 until m).map(mi => s"t.a$mi[x.c$mi + 1]").mkString(" + ")
    val ivfCtes = if (!ivf) "" else
      s"""icents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
         |    embedding AS cent
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |bucketed AS (
         |  SELECT nid, cent_id AS bucket FROM (
         |    SELECT e.vec_id AS nid, c.cent_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.embedding, c.cent)
         |          DESC, c.cent_id) AS r
         |    FROM embeddings e, icents c) WHERE r = 1),
         |iprobes AS (
         |  SELECT qid, bucket FROM (
         |    SELECT e.vec_id AS qid, c.cent_id AS bucket,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.embedding, c.cent)
         |          DESC, c.cent_id) AS r
         |    FROM embeddings e, icents c WHERE e.vec_id < 10) t
         |  WHERE r <= 4),
         |""".stripMargin
    val adFrom = if (!ivf)
      "FROM codes x CROSS JOIN dtq t"
    else
      """FROM codes x
        |  JOIN bucketed bk ON bk.nid = x.vec_id
        |  JOIN iprobes p ON p.bucket = bk.bucket
        |  JOIN dtq t ON t.qid = p.qid""".stripMargin
    s"""WITH ${ivfCtes}cents AS (
       |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
       |  WHERE vec_id < $kk),
       |cd AS (
       |  SELECT e.vec_id, c.cid,
       |    $cdCols
       |  FROM embeddings e CROSS JOIN cents c),
       |$codeCtes,
       |codes AS (
       |  SELECT vec_id, $codeSel FROM codes_0 c0
       |  $codeJoin),
       |dt AS (
       |  SELECT q.vec_id AS qid, c.cid,
       |    $dtCols
       |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 10),
       |dtq AS (
       |  SELECT qid,
       |    $dtqCols
       |  FROM dt GROUP BY qid),
       |ad AS (
       |  SELECT t.qid AS query_id, x.vec_id AS neighbor_id,
       |    $adSum AS adist
       |  $adFrom
       |  WHERE x.vec_id <> t.qid),
       |pqtop AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
       |    FROM ad) WHERE rn <= $k),
       |fullk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.embedding, c.embedding)
       |          DESC, c.vec_id) AS r
       |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 10) z WHERE r <= $k)
       |SELECT f.query_id,
       |  CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_overlap,
       |  CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS DOUBLE) / $k AS recall
       |FROM fullk f LEFT JOIN pqtop p
       |  ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
       |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin
  }

  /** q125 + q129 shared oracle: the one-shot trailing-7-day distinct
    * series (the incremental update must be indistinguishable from it). */
  private lazy val slidingDistinctOracleSql: String =
    """WITH e AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS d, user_id
      |  FROM events),
      |b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM e),
      |w AS (
      |  SELECT DISTINCT d + i AS wd, user_id
      |  FROM e, unnest(generate_series(0, 6)) AS u(i))
      |SELECT CAST(w.wd AS BIGINT) AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM w, b WHERE w.wd BETWEEN b.lo AND b.hi
      |GROUP BY w.wd ORDER BY day""".stripMargin

  /** q90 + q96 shared oracle: the full-data greedy funnel (q96's
    * incremental fold must be indistinguishable from it). */
  /** q54/q112 shared oracle: one-shot sessionization (the incremental
    * fold must hash-match it exactly). */
  private lazy val sessionOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_type,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pd
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, event_type,
      |    SUM(CASE WHEN pd IS NULL
      |             OR date_diff('microsecond', pd, ts) >= 21600000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e),
      |s AS (
      |  SELECT user_id,
      |    epoch_us(MIN(ts)) AS session_start_us,
      |    epoch_us(MAX(ts)) AS session_end_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      |      AS n_purchases
      |  FROM g GROUP BY user_id, sid)
      |SELECT user_id, session_start_us, session_end_us, n_events, n_purchases,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY session_start_us)
      |    AS BIGINT) AS session_idx
      |FROM s ORDER BY user_id, session_idx""".stripMargin

  private lazy val funnelOracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t, event_type
      |  FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(t) AS t1 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.t) AS t2
      |  FROM ev e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.t) AS t3
      |  FROM ev e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM ev)
      |SELECT u.user_id, t1 AS t1_us, t2 AS t2_us, t3 AS t3_us,
      |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
      |            WHEN t2 IS NOT NULL THEN 2
      |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS steps_completed
      |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  private lazy val minhashOracleSql: String = {
    val estJ = (0 until 32)
      .map(i => s"CASE WHEN a.sig[${i + 1}] = b.sig[${i + 1}] THEN 1 ELSE 0 END")
      .mkString("\n    + ")
    s"""WITH $minhashPipelineCte
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST($estJ AS DOUBLE) / 32.0 AS est_jaccard
       |FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |WHERE a.bsz BETWEEN 2 AND 1000
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q60 oracle: the same full signature/band/bucket pipeline as q18, with
    * pairs restricted to at-least-one-batch-side (doc_id % 10 == 0) — the
    * definitional check that the incremental probe emits exactly
    * `pairs(store ∪ batch)` minus the store-only pairs. */
  private lazy val incrementalDedupOracleSql: String = {
    val estJ = (0 until 32)
      .map(i => s"CASE WHEN a.sig[${i + 1}] = b.sig[${i + 1}] THEN 1 ELSE 0 END")
      .mkString("\n    + ")
    s"""WITH $minhashPipelineCte
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST($estJ AS DOUBLE) / 32.0 AS est_jaccard
       |FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |WHERE a.bsz BETWEEN 2 AND 1000
       |  AND (a.id % 10 = 0 OR b.id % 10 = 0)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q47 oracle: minhash pairs -> connected components via a recursive CTE
    * (min reachable id per node == the distributed label propagation). */
  private lazy val dedupGroupsOracleSql: String =
    s"""WITH RECURSIVE $minhashPipelineCte,
       |mpairs AS (
       |  SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |edges AS (SELECT ia AS a, ib AS b FROM mpairs UNION SELECT ib, ia FROM mpairs),
       |walk(id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id)
       |SELECT id, min(lbl) AS component FROM walk GROUP BY id ORDER BY id""".stripMargin

  /** q231 oracle: the q18 pair pipeline crossed with the q36 md5 split
    * law; counts and floor-ppm rates replayed verbatim. */
  private lazy val splitLeakageOracleSql: String =
    s"""WITH $minhashPipelineCte,
       |mpairs AS (
       |  SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |lab AS (
       |  SELECT ia, ib,
       |    ((${PortableHash.md5Hash60Sql("ia")} % 1000000) < 900000) AS ta,
       |    ((${PortableHash.md5Hash60Sql("ib")} % 1000000) < 900000) AS tb
       |  FROM mpairs),
       |ag AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(COALESCE(SUM(CASE WHEN ta AND tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_train_train,
       |    CAST(COALESCE(SUM(CASE WHEN NOT ta AND NOT tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_held_held,
       |    CAST(COALESCE(SUM(CASE WHEN ta <> tb THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS n_cross
       |  FROM lab),
       |lh AS (
       |  SELECT CAST(COUNT(DISTINCT CASE WHEN ta THEN ib ELSE ia END) AS BIGINT)
       |    AS n_held_docs_leaked
       |  FROM lab WHERE ta <> tb),
       |ht AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_held_docs FROM documents
       |  WHERE (${PortableHash.md5Hash60Sql("doc_id")} % 1000000) >= 900000)
       |SELECT n_pairs, n_train_train, n_held_held, n_cross,
       |  n_held_docs_leaked, n_held_docs,
       |  CASE WHEN n_pairs > 0
       |    THEN (n_cross * 1000000) // n_pairs ELSE 0 END AS leak_ppm,
       |  CASE WHEN n_held_docs > 0
       |    THEN (n_held_docs_leaked * 1000000) // n_held_docs ELSE 0 END
       |    AS exposure_ppm
       |FROM ag, lh, ht""".stripMargin

  /** q234 oracle: the q18 pair pipeline labeled under BOTH split laws —
    * row-keyed and group-keyed md5 buckets (the [[graft.operators.Splits]]
    * salt law, replayed via [[graft.operators.Splits.bucketSql]]) — one
    * row per law with the same counts/floor-ppm algebra as q231. */
  private lazy val groupLeakageOracleSql: String = {
    import graft.operators.Splits
    val trainPpm = 800000L
    def lawBlock(ta: String, tb: String, heldBucket: String,
        tag: String): String =
      s"""ag$tag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN ga = gb THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_same_group,
         |    CAST(COALESCE(SUM(CASE WHEN $ta <> $tb THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_cross
         |  FROM lab),
         |lh$tag AS (
         |  SELECT CAST(COUNT(DISTINCT CASE WHEN $ta THEN ib ELSE ia END)
         |    AS BIGINT) AS n_held_docs_leaked
         |  FROM lab WHERE $ta <> $tb),
         |ht$tag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_held_docs FROM documents
         |  WHERE $heldBucket >= $trainPpm)""".stripMargin
    def lawSelect(law: String, tag: String): String =
      s"""SELECT '$law' AS split_law, n_pairs, n_same_group, n_cross,
         |  CASE WHEN n_pairs > 0
         |    THEN (n_cross * 1000000) // n_pairs ELSE 0 END AS leak_ppm,
         |  n_held_docs_leaked, n_held_docs,
         |  CASE WHEN n_held_docs > 0
         |    THEN (n_held_docs_leaked * 1000000) // n_held_docs ELSE 0 END
         |    AS exposure_ppm
         |FROM ag$tag, lh$tag, ht$tag""".stripMargin
    s"""WITH $minhashPipelineCte,
       |mpairs AS (
       |  SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |lab AS (
       |  SELECT ia, ib, da.source AS ga, db.source AS gb,
       |    (${Splits.bucketSql("ia")} < $trainPpm) AS ta_doc,
       |    (${Splits.bucketSql("ib")} < $trainPpm) AS tb_doc,
       |    (${Splits.bucketSql("da.source")} < $trainPpm) AS ta_grp,
       |    (${Splits.bucketSql("db.source")} < $trainPpm) AS tb_grp
       |  FROM mpairs
       |  JOIN documents da ON da.doc_id = ia
       |  JOIN documents db ON db.doc_id = ib),
       |${lawBlock("ta_doc", "tb_doc", Splits.bucketSql("doc_id"), "d")},
       |${lawBlock("ta_grp", "tb_grp", Splits.bucketSql("source"), "g")}
       |${lawSelect("doc_hash", "d")}
       |UNION ALL
       |${lawSelect("group_hash", "g")}
       |ORDER BY split_law""".stripMargin
  }

  /** q233 oracle: q229's closed-form pixel-law replay extended with the
    * dHash lattice — aHash on the 8×8 grid, dHash signs on the 9×8 grid,
    * union band harvest over all 8 bands at the combined-fingerprint
    * grain, exact per-family bit_count(xor) Hamming, pair kept when
    * EITHER distance ≤ 3 (the Spark side is the only one touching the
    * PNG codec; lossless decode ≡ law). */
  /** Per-block pixel-law columns — [[graft.multimodal.Multimodal
    * .pixelXCoef]] / `pixelPhase` replayed in SQL: `cx` (x-coefficient)
    * and `ph` (additive phase) derived from the 1M-id media block of
    * `idExpr`. Identity in block 0 (cx = 7, ph = 0), so base-sf results
    * are unchanged; at replica scale each block carries its own pixel-law
    * class and the image/video fingerprint space grows with the corpus. */
  private def pixelBlockCols(idExpr: String): String =
    s"CAST(7 + 2 * (((($idExpr) // 1000000) * 5) % 96) AS BIGINT) AS cx,\n" +
      s"    CAST(((($idExpr) // 1000000) * 97) % 256 AS BIGINT) AS ph"

  /** The [[graft.operators.Dedup.aHashPairGraph]] banded-fingerprint
    * pair algebra as ONE parameterized CTE chain — the single home of
    * the two cap constants (exact-fingerprint group cap, band-bucket
    * occupancy cap, both 10000) that were previously hand-duplicated
    * across the q229/q233/q237/q245 oracles; a cap or Hamming change
    * now edits exactly one place. Reads an existing CTE
    * `${p}hs(media_id, <bands...>)` and emits `${p}grp` (ids grouped by
    * exact fingerprint, over-cap groups dropped WHOLE so an over-cap
    * corpus diverges loudly instead of silently), `${p}banded`/
    * `${p}bocc`/`${p}rp` (rep pairs sharing a band bucket, over-cap
    * buckets dropped — bucketPairs' maxBucket at the rep grain),
    * `${p}ham` (one XOR-popcount distance per `hammings` entry),
    * `${p}cross_pairs` (the rep-pair expansion to id pairs, kept when
    * `gate` — a boolean over the hamming output names — holds) and
    * `${p}within` (the within-group distance-0 expansion). */
  private def aHashPairAlgebraCtes(
      p: String,
      bands: Seq[String],
      hammings: Seq[(String, Seq[String])],
      gate: String): String = {
    val bandList = bands.mkString(", ")
    val bandedSelects = bands.zipWithIndex.map { case (c, i) =>
      if (i == 0) s"SELECT rep, 0 AS band, $c AS bk FROM ${p}grp"
      else s"UNION ALL SELECT rep, $i, $c FROM ${p}grp"
    }.mkString("\n  ")
    val hamCols = hammings.map { case (n, cols) =>
      s"CAST(${cols.map(c => s"bit_count(xor(ga.$c, gb.$c))").mkString(" + ")} AS BIGINT) AS $n"
    }.mkString(",\n    ")
    val hamNames = hammings.map(_._1).mkString(", ")
    val zeroCols = hammings.map { case (n, _) => s"CAST(0 AS BIGINT) AS $n" }
      .mkString(", ")
    s"""${p}grp AS (
       |  -- the Spark harvest drops over-cap exact-fingerprint groups whole
       |  -- (Dedup.aHashPairGraph maxBucket): model the cap so an over-cap
       |  -- corpus diverges loudly here instead of silently
       |  SELECT $bandList, list_sort(list(media_id)) AS ids,
       |    MIN(media_id) AS rep
       |  FROM ${p}hs GROUP BY ALL HAVING COUNT(*) <= 10000),
       |${p}banded AS (
       |  $bandedSelects),
       |${p}bocc AS (SELECT band, bk, COUNT(*) AS c FROM ${p}banded GROUP BY 1, 2),
       |${p}rp AS (
       |  -- band-bucket occupancy cap (bucketPairs maxBucket at rep grain)
       |  SELECT DISTINCT x.rep AS ra, y.rep AS rb
       |  FROM ${p}banded x JOIN ${p}banded y
       |    ON x.band = y.band AND x.bk = y.bk AND x.rep < y.rep
       |  JOIN ${p}bocc o ON o.band = x.band AND o.bk = x.bk
       |  WHERE o.c <= 10000),
       |${p}ham AS (
       |  SELECT ra, rb,
       |    $hamCols,
       |    ga.ids AS ia, gb.ids AS ib
       |  FROM ${p}rp
       |  JOIN ${p}grp ga ON ga.rep = ra
       |  JOIN ${p}grp gb ON gb.rep = rb),
       |${p}cross_pairs AS (
       |  SELECT LEAST(xa.a, yb.b) AS id_a, GREATEST(xa.a, yb.b) AS id_b,
       |    $hamNames
       |  FROM ${p}ham, unnest(ia) AS xa(a), unnest(ib) AS yb(b)
       |  WHERE $gate),
       |${p}within AS (
       |  SELECT xa.a AS id_a, yb.b AS id_b, $zeroCols
       |  FROM ${p}grp, unnest(ids) AS xa(a), unnest(ids) AS yb(b)
       |  WHERE xa.a < yb.b)""".stripMargin
  }

  /** The q229/q237-shaped single-hash instantiation of
    * [[aHashPairAlgebraCtes]]: 4×16-bit bands `b0..b3`, one `hamming`,
    * pairs kept at Hamming ≤ 3. */
  private def aHashPairAlgebraCtes4(p: String): String =
    aHashPairAlgebraCtes(p, (0 until 4).map(i => s"b$i"),
      Seq(("hamming", (0 until 4).map(i => s"b$i"))), "hamming <= 3")

  private lazy val dhashPairsCtes: String = {
    val aCols = (0 until 4).map(i => s"a$i")
    val dCols = (0 until 4).map(i => s"d$i")
    def pivot(out: Seq[String]): String =
      out.zipWithIndex.map { case (c, i) =>
        s"MAX(CASE WHEN band = $i THEN bk END) AS $c"
      }.mkString(",\n    ")
    val allCols = (aCols ++ dCols).mkString(", ")
    s"""img AS (
       |  SELECT doc_id AS media_id,
       |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
       |    CAST(doc_id % 24 + 1 AS INTEGER) AS h,
       |    ${pixelBlockCols("doc_id")}
       |  FROM documents WHERE doc_id % 3 = 0),
       |px AS (
       |  SELECT media_id, (js.j * 8 + ii.i) AS p,
       |    (media_id * 31 + ((ii.i * w) // 8) * cx
       |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
       |  FROM img,
       |    unnest(generate_series(0, 7)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |m AS (SELECT media_id, SUM(g) // 64 AS mean FROM px GROUP BY 1),
       |ab AS (
       |  SELECT px.media_id, p // 16 AS band,
       |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
       |      AS INTEGER) AS bk
       |  FROM px JOIN m USING (media_id) GROUP BY 1, 2),
       |pxd AS (
       |  SELECT media_id, ii.i AS i, js.j AS j,
       |    (media_id * 31 + ((ii.i * w) // 9) * cx
       |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
       |  FROM img,
       |    unnest(generate_series(0, 8)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |db AS (
       |  SELECT a.media_id, (a.j * 8 + a.i) // 16 AS band,
       |    CAST(SUM(CASE WHEN b.g > a.g
       |      THEN (1 << ((a.j * 8 + a.i) % 16)) ELSE 0 END) AS INTEGER) AS bk
       |  FROM pxd a JOIN pxd b
       |    ON b.media_id = a.media_id AND b.j = a.j AND b.i = a.i + 1
       |  WHERE a.i < 8 GROUP BY 1, 2),
       |ha AS (
       |  SELECT media_id,
       |    ${pivot(aCols)}
       |  FROM ab GROUP BY 1),
       |hd AS (
       |  SELECT media_id,
       |    ${pivot(dCols)}
       |  FROM db GROUP BY 1),
       |hs AS (
       |  SELECT media_id, $allCols FROM ha JOIN hd USING (media_id)),
       |${aHashPairAlgebraCtes("", aCols ++ dCols,
            Seq(("hamming_a", aCols), ("hamming_d", dCols)),
            "LEAST(hamming_a, hamming_d) <= 3")}""".stripMargin
  }

  private lazy val dhashNearDupOracleSql: String =
    s"""WITH $dhashPairsCtes
       |SELECT id_a, id_b, hamming_a, hamming_d FROM cross_pairs
       |UNION ALL SELECT id_a, id_b, hamming_a, hamming_d FROM within
       |ORDER BY id_a, id_b""".stripMargin

  /** Audio fingerprint pair CTEs (prefix-parameterized so q239 can
    * compose them next to the image/video families): the closed-form PCM
    * law replayed codec-free (WAV PCM is lossless, so the Spark side's
    * real `javax.sound.sampled` decode sees exactly these samples):
    * |sample| summed over 60-sample frames → 64 energy-gradient sign bits
    * → 4×16-bit bands → q229's pairing algebra verbatim. Produces
    * `${p}cross_pairs` / `${p}within` with (id_a, id_b, hamming). */
  private def audioPairCtes(p: String): String =
    s"""${p}aud AS (
       |  -- block-extended track/stride laws (Multimodal.audioTrack/
       |  -- audioStep): 53 tracks PER 1M-id block, stride alphabet widened
       |  -- by 5*(block % 11) — identity in block 0
       |  SELECT doc_id AS media_id,
       |    (doc_id % 53) + 53 * (doc_id // 1000000) AS trk,
       |    CAST(3 + 2 * ((((doc_id % 53) + 53 * (doc_id // 1000000)) % 5)
       |      + 5 * ((doc_id // 1000000) % 11)) AS BIGINT) AS st,
       |    CAST(1 + doc_id % 2 AS BIGINT) AS g
       |  FROM documents WHERE doc_id % 3 = 1),
       |${p}sm AS (
       |  SELECT media_id, ts.t // 60 AS f,
       |    abs(((trk * 31 + ts.t * st) % 256) - 128) * g AS a
       |  FROM ${p}aud, unnest(generate_series(0, 3899)) AS ts(t)),
       |${p}en AS (SELECT media_id, f, SUM(a) AS e FROM ${p}sm GROUP BY 1, 2),
       |${p}bits AS (
       |  SELECT x.media_id, x.f AS p,
       |    CASE WHEN y.e > x.e THEN 1 ELSE 0 END AS bit
       |  FROM ${p}en x JOIN ${p}en y
       |    ON y.media_id = x.media_id AND y.f = x.f + 1
       |  WHERE x.f < 64),
       |${p}b AS (
       |  SELECT media_id, p // 16 AS band,
       |    CAST(SUM(bit * (1 << (p % 16))) AS INTEGER) AS bk
       |  FROM ${p}bits GROUP BY 1, 2),
       |${p}hs AS (
       |  SELECT media_id,
       |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
       |  FROM ${p}b GROUP BY 1),
       |${aHashPairAlgebraCtes4(p)}""".stripMargin

  /** q237 oracle: [[audioPairCtes]] unprefixed, pairs emitted. */
  private lazy val audioFingerprintOracleSql: String =
    s"""WITH ${audioPairCtes("")}
       |SELECT id_a, id_b, hamming FROM cross_pairs
       |UNION ALL SELECT id_a, id_b, hamming FROM within
       |ORDER BY id_a, id_b""".stripMargin

  /** Video sampled-frame pair CTEs (prefix-parameterized for q239):
    * per-frame pixel-law replay (TIFF is lossless — the Spark side's real
    * multi-page ImageIO decode sees exactly these values) at the sampled
    * indices 0,2,…, the q229 aHash lattice per frame, then exact-match
    * pairing at the (frame, fingerprint) grain with the same ≤10000
    * bucket cap the Spark harvest applies. Produces `${p}pc`
    * (id_a, id_b, n_match) and `${p}cnt` (media_id, n). */
  private def videoPairCtes(p: String, stride: Int = 2): String =
    s"""${p}vid AS (
       |  SELECT doc_id AS media_id,
       |    CAST(doc_id % 16 + 8 AS BIGINT) AS w,
       |    CAST(doc_id % 12 + 6 AS BIGINT) AS h,
       |    CAST(4 + doc_id % 5 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |${p}fr AS (
       |  SELECT media_id, w, h, fs.f,
       |    ${pixelBlockCols("media_id + fs.f * 9973")}
       |  FROM ${p}vid, unnest(generate_series(0, 7)) AS fs(f)
       |  WHERE fs.f < nf AND fs.f % $stride = 0),
       |${p}px AS (
       |  SELECT media_id, f, (js.j * 8 + ii.i) AS p,
       |    ((media_id + f * 9973) * 31 + ((ii.i * w) // 8) * cx
       |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
       |  FROM ${p}fr,
       |    unnest(generate_series(0, 7)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |${p}m AS (
       |  SELECT media_id, f, SUM(g) // 64 AS mean FROM ${p}px GROUP BY 1, 2),
       |${p}b AS (
       |  SELECT ${p}px.media_id, ${p}px.f, p // 16 AS band,
       |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
       |      AS INTEGER) AS bk
       |  FROM ${p}px JOIN ${p}m USING (media_id, f) GROUP BY 1, 2, 3),
       |${p}hs AS (
       |  SELECT media_id, f,
       |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
       |  FROM ${p}b GROUP BY 1, 2),
       |${p}occ AS (
       |  SELECT f, b0, b1, b2, b3, COUNT(*) AS c
       |  FROM ${p}hs GROUP BY ALL),
       |${p}mp AS (
       |  SELECT x.media_id AS ia, y.media_id AS ib
       |  FROM ${p}hs x JOIN ${p}hs y
       |    ON x.f = y.f AND x.b0 = y.b0 AND x.b1 = y.b1
       |      AND x.b2 = y.b2 AND x.b3 = y.b3 AND x.media_id < y.media_id
       |  JOIN ${p}occ o ON o.f = x.f AND o.b0 = x.b0 AND o.b1 = x.b1
       |    AND o.b2 = x.b2 AND o.b3 = x.b3
       |  WHERE o.c <= 10000),
       |${p}pc AS (
       |  SELECT ia AS id_a, ib AS id_b, CAST(COUNT(*) AS BIGINT) AS n_match
       |  FROM ${p}mp GROUP BY 1, 2),
       |${p}cnt AS (
       |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM ${p}hs GROUP BY 1)""".stripMargin

  /** q238 oracle: [[videoPairCtes]] unprefixed, pairs + frame counts. */
  private lazy val videoFrameSigOracleSql: String =
    s"""WITH ${videoPairCtes("")}
       |SELECT id_a, id_b, n_match, ca.n AS n_a, cb.n AS n_b
       |FROM pc
       |JOIN cnt ca ON ca.media_id = id_a
       |JOIN cnt cb ON cb.media_id = id_b
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared CTE chain for the q239/q240/q243 family: the three modality
    * pair families (image [[dhashPairsCtes]], audio [[audioPairCtes]],
    * video [[videoPairCtes]] — id spaces disjoint by the doc_id % 3
    * residue law) unioned into one MATERIALIZED edge list (the recursive
    * walk must not re-evaluate the three-family pipeline per round —
    * uncached it ran >300 s, materialized ~1 s), folded to components by
    * recursive reachability (q236's walk), then joined back to the FULL
    * media universe as `md(media_id, media_type, component)` — singletons
    * keep themselves. */
  private lazy val mediaComponentCtes: String =
    s"""$dhashPairsCtes,
       |${audioPairCtes("a_")},
       |${videoPairCtes("v_")},
       |allp AS MATERIALIZED (
       |  SELECT id_a, id_b FROM cross_pairs
       |  UNION SELECT id_a, id_b FROM within
       |  UNION SELECT id_a, id_b FROM a_cross_pairs
       |  UNION SELECT id_a, id_b FROM a_within
       |  UNION SELECT id_a, id_b FROM v_pc),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM allp
       |  UNION SELECT id_b, id_a FROM allp),
       |walk(id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id),
       |comp AS (SELECT id, MIN(lbl) AS c FROM walk GROUP BY id),
       |md AS (
       |  SELECT d.doc_id AS media_id,
       |    CASE WHEN d.doc_id % 3 = 0 THEN 'image'
       |         WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
       |      AS media_type,
       |    COALESCE(c.c, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)""".stripMargin

  /** q239 oracle: [[mediaComponentCtes]], manifest emitted. */
  private lazy val mediaDedupManifestOracleSql: String =
    s"""WITH RECURSIVE $mediaComponentCtes
       |SELECT media_id, media_type, component,
       |  (component = media_id) AS keep
       |FROM md ORDER BY media_id""".stripMargin

  /** q240 oracle: the q239 component manifest (three pair families +
    * recursive components + full-universe left join) labeled under BOTH
    * split laws — row-keyed md5 and COMPONENT-keyed md5 — with q234's
    * counts/floor-ppm algebra. The group-law row must read n_cross = 0:
    * both ends of every pair share a component by construction. */
  private lazy val componentSplitOracleSql: String = {
    import graft.operators.Splits
    val trainPpm = 800000L
    def lawBlock(ta: String, tb: String, heldBucket: String,
        tag: String): String =
      s"""ag$tag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN ga = gb THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_same_group,
         |    CAST(COALESCE(SUM(CASE WHEN $ta <> $tb THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_cross
         |  FROM lab),
         |lh$tag AS (
         |  SELECT CAST(COUNT(DISTINCT CASE WHEN $ta THEN ib ELSE ia END)
         |    AS BIGINT) AS n_held_docs_leaked
         |  FROM lab WHERE $ta <> $tb),
         |ht$tag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_held_docs FROM md
         |  WHERE $heldBucket >= $trainPpm)""".stripMargin
    def lawSelect(law: String, tag: String): String =
      s"""SELECT '$law' AS split_law, n_pairs, n_same_group, n_cross,
         |  CASE WHEN n_pairs > 0
         |    THEN (n_cross * 1000000) // n_pairs ELSE 0 END AS leak_ppm,
         |  n_held_docs_leaked, n_held_docs,
         |  CASE WHEN n_held_docs > 0
         |    THEN (n_held_docs_leaked * 1000000) // n_held_docs ELSE 0 END
         |    AS exposure_ppm
         |FROM ag$tag, lh$tag, ht$tag""".stripMargin
    s"""WITH RECURSIVE $mediaComponentCtes,
       |lab AS (
       |  SELECT p.id_a AS ia, p.id_b AS ib,
       |    ma.component AS ga, mb.component AS gb,
       |    (${Splits.bucketSql("p.id_a")} < $trainPpm) AS ta_doc,
       |    (${Splits.bucketSql("p.id_b")} < $trainPpm) AS tb_doc,
       |    (${Splits.bucketSql("ma.component")} < $trainPpm) AS ta_grp,
       |    (${Splits.bucketSql("mb.component")} < $trainPpm) AS tb_grp
       |  FROM allp p
       |  JOIN md ma ON ma.media_id = p.id_a
       |  JOIN md mb ON mb.media_id = p.id_b),
       |${lawBlock("ta_doc", "tb_doc", Splits.bucketSql("media_id"), "d")},
       |${lawBlock("ta_grp", "tb_grp", Splits.bucketSql("component"), "g")}
       |${lawSelect("doc_hash", "d")}
       |UNION ALL
       |${lawSelect("group_hash", "g")}
       |ORDER BY split_law""".stripMargin
  }

  /** q241 oracle: the image pair family ([[dhashPairsCtes]]) full-outer
    * joined at the pair grain with the caption MinHash pairs (the q18
    * pipeline, prefixed `c_`, restricted to image-modality rows) — three
    * exact policy-cell counts. */
  private lazy val imageCaptionCellsOracleSql: String =
    s"""WITH ${minhashPipelineCtes("c_")},
       |$dhashPairsCtes,
       |cpairs AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM c_sized a JOIN c_sized b
       |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000
       |    AND a.id % 3 = 0 AND b.id % 3 = 0),
       |ip AS (
       |  SELECT id_a, id_b FROM cross_pairs
       |  UNION SELECT id_a, id_b FROM within),
       |u AS (
       |  SELECT (i.id_a IS NOT NULL) AS img, (c.id_a IS NOT NULL) AS cap
       |  FROM ip i FULL OUTER JOIN cpairs c
       |    ON c.id_a = i.id_a AND c.id_b = i.id_b)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(SUM(CASE WHEN img AND cap THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_both,
       |  CAST(COALESCE(SUM(CASE WHEN img AND NOT cap THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_image_only,
       |  CAST(COALESCE(SUM(CASE WHEN NOT img AND cap THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_caption_only
       |FROM u""".stripMargin

  /** q242 oracle: the closed-form pixel law evaluated at the nearest-
    * neighbor resample coordinates ((x·w) div 8, (y·h) div 6) — every hop
    * of the Spark side's encode→decode→resize→encode→decode chain is
    * lossless PNG, so the re-decoded gray sum equals this law replay. */
  private lazy val resizeAuditOracleSql: String =
    s"""WITH img AS (
      |  SELECT doc_id AS media_id,
      |    CAST(doc_id % 32 + 1 AS BIGINT) AS w,
      |    CAST(doc_id % 24 + 1 AS BIGINT) AS h,
      |    ${pixelBlockCols("doc_id")}
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT media_id,
      |    (media_id * 31 + ((xs.x * w) // 8) * cx
      |      + ((ys.y * h) // 6) * 13 + ph) % 256 AS g
      |  FROM img,
      |    unnest(generate_series(0, 7)) AS xs(x),
      |    unnest(generate_series(0, 5)) AS ys(y))
      |SELECT media_id, CAST(8 AS INTEGER) AS decoded_width,
      |  CAST(6 AS INTEGER) AS decoded_height,
      |  CAST(SUM(g) AS BIGINT) AS gray_sum
      |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin

  /** q245 oracle: the q229 aHash algebra over the UNION of original
    * fingerprints and resized-derivative fingerprints. The derivative's
    * lattice replays as law-at-resample-coordinates: the resized 16×12
    * thumbnail's pixel (x, y) is the original's ((x·w) div 16,
    * (y·h) div 12), and the aHash of a 16×12 image samples (2i,
    * (3j) div 2) — so derivative gray = law(id, (i·w) div 8,
    * ((((3j) div 2)·h) div 12)). Derivative ids carry +500000000; pair
    * kinds as in the Spark builder.
    *
    * The pair algebra is the shared [[aHashPairAlgebraCtes4]] chain —
    * cap/Hamming constants live in one place for all aHash oracles. */
  private lazy val resizeRobustOracleSql: String =
    s"""WITH img AS (
       |  SELECT doc_id AS media_id,
       |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
       |    CAST(doc_id % 24 + 1 AS INTEGER) AS h,
       |    ${pixelBlockCols("doc_id")}
       |  FROM documents WHERE doc_id % 3 = 0),
       |opx AS (
       |  SELECT media_id, (js.j * 8 + ii.i) AS p,
       |    (media_id * 31 + ((ii.i * w) // 8) * cx
       |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
       |  FROM img,
       |    unnest(generate_series(0, 7)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |rpx AS (
       |  SELECT media_id + 500000000 AS rid, (js.j * 8 + ii.i) AS p,
       |    (media_id * 31 + ((ii.i * w) // 8) * cx
       |      + (((((js.j * 3) // 2)) * h) // 12) * 13 + ph) % 256 AS g
       |  FROM img,
       |    unnest(generate_series(0, 7)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |px AS (
       |  SELECT media_id, p, g FROM opx
       |  UNION ALL SELECT rid, p, g FROM rpx),
       |m AS (SELECT media_id, SUM(g) // 64 AS mean FROM px GROUP BY 1),
       |b AS (
       |  SELECT px.media_id, p // 16 AS band,
       |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
       |      AS INTEGER) AS bk
       |  FROM px JOIN m USING (media_id) GROUP BY 1, 2),
       |hs AS (
       |  SELECT media_id,
       |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
       |  FROM b GROUP BY 1),
       |${aHashPairAlgebraCtes4("")},
       |allp AS (
       |  SELECT id_a, id_b, hamming FROM cross_pairs
       |  UNION ALL SELECT id_a, id_b, hamming FROM within)
       |SELECT id_a, id_b, hamming,
       |  CASE WHEN id_b - id_a = 500000000 THEN 'self'
       |       WHEN id_b < 500000000 THEN 'orig_orig'
       |       WHEN id_a >= 500000000 THEN 'resized_resized'
       |       ELSE 'cross' END AS pair_kind
       |FROM allp ORDER BY id_a, id_b""".stripMargin

  /** q243 oracle: [[mediaComponentCtes]] + the q41 token-count formula —
    * per component, the member with the (max tokens, min id) keeper rank. */
  private lazy val qualityKeeperOracleSql: String =
    s"""WITH RECURSIVE $mediaComponentCtes,
       |tk AS (
       |  SELECT doc_id AS media_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |j AS (
       |  SELECT md.media_id, md.component, tk.n_tokens
       |  FROM md JOIN tk USING (media_id)),
       |r AS (
       |  SELECT component, media_id, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY component
       |      ORDER BY n_tokens DESC, media_id) AS rn
       |  FROM j),
       |c AS (
       |  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
       |  FROM j GROUP BY 1)
       |SELECT c.component, c.n_members, r.n_tokens AS keeper_tokens,
       |  r.media_id AS keeper_id
       |FROM c JOIN r ON r.component = c.component AND r.rn = 1
       |ORDER BY c.component""".stripMargin

  /** q244 oracle: [[videoPairCtes]] at stride 1 (all frames), fingerprint-
    * only cross-video matches grouped by constant index offset, longest
    * consecutive run per (pair, offset) via the q07 islands algebra, with
    * the same ≤10000 hash-bucket cap the Spark harvest applies. */
  private lazy val clipReuseOracleSql: String =
    s"""WITH ${videoPairCtes("", stride = 1)},
       |hocc AS (
       |  SELECT b0, b1, b2, b3, COUNT(*) AS c FROM hs GROUP BY ALL),
       |ali AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(b.f - a.f AS INTEGER) AS frame_offset, a.f AS fa
       |  FROM hs a JOIN hs b
       |    ON a.b0 = b.b0 AND a.b1 = b.b1 AND a.b2 = b.b2 AND a.b3 = b.b3
       |      AND a.media_id < b.media_id
       |  JOIN hocc o ON o.b0 = a.b0 AND o.b1 = a.b1 AND o.b2 = a.b2
       |    AND o.b3 = a.b3
       |  WHERE o.c <= 10000),
       |isl AS (
       |  SELECT id_a, id_b, frame_offset,
       |    fa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, frame_offset
       |      ORDER BY fa) AS grp
       |  FROM ali),
       |runs AS (
       |  SELECT id_a, id_b, frame_offset, grp, COUNT(*) AS run
       |  FROM isl GROUP BY ALL)
       |SELECT id_a, id_b, frame_offset,
       |  CAST(SUM(run) AS BIGINT) AS n_aligned,
       |  CAST(MAX(run) AS BIGINT) AS max_run
       |FROM runs GROUP BY 1, 2, 3
       |HAVING MAX(run) >= 2
       |ORDER BY id_a, id_b, frame_offset""".stripMargin

  /** q247 oracle: per-frame energies of the SHIFTED clip law (hash-noise
    * frame values via the portable md5Hash60 stream; clip re-post =
    * master played from `(id div 53) mod 4` whole frames in), 16-bit
    * windowed gradient signatures, then the q244 clip algebra —
    * fingerprint-only buckets with the ≤10000 cap, constant-offset
    * grouping, islands runs, minRun 8. WAV PCM is lossless, so the Spark
    * side's real `javax.sound.sampled` decode sees exactly 60·|value|·g
    * per frame. */
  private lazy val audioClipReuseOracleSql: String =
    s"""WITH aud AS (
       |  SELECT doc_id AS media_id,
       |    (doc_id % 53) + 53 * (doc_id // 1000000) AS trk,
       |    CAST(1 + doc_id % 2 AS BIGINT) AS g,
       |    (doc_id // 53) % 4 AS sh
       |  FROM documents WHERE doc_id % 3 = 1),
       |en AS (
       |  SELECT media_id, fs.f,
       |    60 * abs((${graft.functions.PortableHash
                        .md5Hash60Sql("trk || ':' || (fs.f + sh)")} % 255)
       |      - 127) * g AS e
       |  FROM aud, unnest(generate_series(0, 64)) AS fs(f)),
       |bits AS (
       |  SELECT x.media_id, x.f AS p,
       |    CASE WHEN y.e > x.e THEN 1 ELSE 0 END AS bit
       |  FROM en x JOIN en y
       |    ON y.media_id = x.media_id AND y.f = x.f + 1
       |  WHERE x.f < 64),
       |sig AS (
       |  SELECT a.media_id, a.p AS f,
       |    CAST(SUM(b.bit * (1 << (b.p - a.p))) AS INTEGER) AS sg
       |  FROM bits a JOIN bits b
       |    ON b.media_id = a.media_id AND b.p BETWEEN a.p AND a.p + 15
       |  WHERE a.p <= 48
       |  GROUP BY 1, 2),
       |socc AS (SELECT sg, COUNT(*) AS c FROM sig GROUP BY 1),
       |ali AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(b.f - a.f AS INTEGER) AS frame_offset, a.f AS fa
       |  FROM sig a JOIN sig b
       |    ON a.sg = b.sg AND a.media_id < b.media_id
       |  JOIN socc o ON o.sg = a.sg
       |  WHERE o.c <= 10000),
       |isl AS (
       |  SELECT id_a, id_b, frame_offset,
       |    fa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, frame_offset
       |      ORDER BY fa) AS grp
       |  FROM ali),
       |runs AS (
       |  SELECT id_a, id_b, frame_offset, grp, COUNT(*) AS run
       |  FROM isl GROUP BY ALL)
       |SELECT id_a, id_b, frame_offset,
       |  CAST(SUM(run) AS BIGINT) AS n_aligned,
       |  CAST(MAX(run) AS BIGINT) AS max_run
       |FROM runs GROUP BY 1, 2, 3
       |HAVING MAX(run) >= 8
       |ORDER BY id_a, id_b, frame_offset""".stripMargin

  /** q249 oracle: the q247 clip-law replay with the signature WIDTH
    * derived from the corpus count — w = smallest bits in [16, 32] with
    * clips·65 ≤ 2·2^bits ([[graft.operators.Dedup.autoBandBits]]'s pure
    * integer rule, replayed in SQL so both engines agree exactly at
    * power-of-two boundaries). Signatures pack into ONE BIGINT here:
    * the Spark side's band-ARRAY equality (bit k → band k/16, position
    * k%16) is equivalent to full-window bit equality, which is what the
    * single integer compares. Then the identical fingerprint-bucket /
    * constant-offset / islands algebra at minRun 8 and the ≤10000 cap. */
  private lazy val audioClipAutoSigOracleSql: String =
    s"""WITH aud AS (
       |  SELECT doc_id AS media_id,
       |    (doc_id % 53) + 53 * (doc_id // 1000000) AS trk,
       |    CAST(1 + doc_id % 2 AS BIGINT) AS g,
       |    (doc_id // 53) % 4 AS sh
       |  FROM documents WHERE doc_id % 3 = 1),
       |wsel AS (
       |  SELECT COALESCE(MIN(gs.b), 32) AS w
       |  FROM unnest(generate_series(16, 32)) AS gs(b)
       |  WHERE (SELECT COUNT(*) * 65 FROM aud)
       |    <= 2 * (CAST(1 AS BIGINT) << gs.b)),
       |en AS (
       |  SELECT media_id, fs.f,
       |    60 * abs((${graft.functions.PortableHash
                        .md5Hash60Sql("trk || ':' || (fs.f + sh)")} % 255)
       |      - 127) * g AS e
       |  FROM aud, unnest(generate_series(0, 64)) AS fs(f)),
       |bits AS (
       |  SELECT x.media_id, x.f AS p,
       |    CASE WHEN y.e > x.e THEN 1 ELSE 0 END AS bit
       |  FROM en x JOIN en y
       |    ON y.media_id = x.media_id AND y.f = x.f + 1
       |  WHERE x.f < 64),
       |sig AS (
       |  SELECT a.media_id, a.p AS f,
       |    SUM(b.bit * (CAST(1 AS BIGINT) << (b.p - a.p))) AS sg
       |  FROM bits a JOIN bits b
       |    ON b.media_id = a.media_id
       |      AND b.p BETWEEN a.p AND a.p + (SELECT w FROM wsel) - 1
       |  WHERE a.p <= 64 - (SELECT w FROM wsel)
       |  GROUP BY 1, 2),
       |socc AS (SELECT sg, COUNT(*) AS c FROM sig GROUP BY 1),
       |ali AS (
       |  SELECT a.media_id AS id_a, b.media_id AS id_b,
       |    CAST(b.f - a.f AS INTEGER) AS frame_offset, a.f AS fa
       |  FROM sig a JOIN sig b
       |    ON a.sg = b.sg AND a.media_id < b.media_id
       |  JOIN socc o ON o.sg = a.sg
       |  WHERE o.c <= 10000),
       |isl AS (
       |  SELECT id_a, id_b, frame_offset,
       |    fa - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, frame_offset
       |      ORDER BY fa) AS grp
       |  FROM ali),
       |runs AS (
       |  SELECT id_a, id_b, frame_offset, grp, COUNT(*) AS run
       |  FROM isl GROUP BY ALL)
       |SELECT id_a, id_b, frame_offset,
       |  CAST(SUM(run) AS BIGINT) AS n_aligned,
       |  CAST(MAX(run) AS BIGINT) AS max_run
       |FROM runs GROUP BY 1, 2, 3
       |HAVING MAX(run) >= 8
       |ORDER BY id_a, id_b, frame_offset""".stripMargin

  /** q248 oracle: the SHOT pixel law ((f div 3)·9973 frame shift)
    * replayed per frame at stride 1, the q229 aHash lattice, then the
    * same lag / running-cut-count / islands algebra — all integers. */
  private lazy val sceneCutsOracleSql: String =
    s"""WITH vid AS (
       |  SELECT doc_id AS media_id,
       |    CAST(doc_id % 16 + 8 AS BIGINT) AS w,
       |    CAST(doc_id % 12 + 6 AS BIGINT) AS h,
       |    CAST(4 + doc_id % 5 AS BIGINT) AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |fr AS (
       |  SELECT media_id, w, h, fs.f,
       |    ${pixelBlockCols("media_id + (fs.f // 3) * 9973")}
       |  FROM vid, unnest(generate_series(0, 7)) AS fs(f)
       |  WHERE fs.f < nf),
       |px AS (
       |  SELECT media_id, f, (js.j * 8 + ii.i) AS p,
       |    ((media_id + (f // 3) * 9973) * 31 + ((ii.i * w) // 8) * cx
       |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
       |  FROM fr,
       |    unnest(generate_series(0, 7)) AS ii(i),
       |    unnest(generate_series(0, 7)) AS js(j)),
       |m AS (
       |  SELECT media_id, f, SUM(g) // 64 AS mean FROM px GROUP BY 1, 2),
       |b AS (
       |  SELECT px.media_id, px.f, p // 16 AS band,
       |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
       |      AS INTEGER) AS bk
       |  FROM px JOIN m USING (media_id, f) GROUP BY 1, 2, 3),
       |hs AS (
       |  SELECT media_id, f,
       |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
       |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
       |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
       |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
       |  FROM b GROUP BY 1, 2),
       |prevd AS (
       |  SELECT media_id, f, b0, b1, b2, b3,
       |    LAG(b0) OVER w AS p0, LAG(b1) OVER w AS p1,
       |    LAG(b2) OVER w AS p2, LAG(b3) OVER w AS p3
       |  FROM hs WINDOW w AS (PARTITION BY media_id ORDER BY f)),
       |cuts AS (
       |  SELECT media_id, f,
       |    CASE WHEN p0 IS NOT NULL
       |      AND bit_count(xor(b0, p0)) + bit_count(xor(b1, p1))
       |        + bit_count(xor(b2, p2)) + bit_count(xor(b3, p3)) >= 8
       |      THEN 1 ELSE 0 END AS cut
       |  FROM prevd),
       |shots AS (
       |  SELECT media_id, f, cut,
       |    SUM(cut) OVER (PARTITION BY media_id ORDER BY f
       |      ROWS UNBOUNDED PRECEDING) AS shot
       |  FROM cuts),
       |sl AS (SELECT media_id, shot, COUNT(*) AS len FROM shots GROUP BY 1, 2),
       |agg1 AS (
       |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       |    CAST(SUM(cut) AS BIGINT) AS n_cuts
       |  FROM shots GROUP BY 1),
       |agg2 AS (
       |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_shots,
       |    CAST(MAX(len) AS BIGINT) AS max_shot_len
       |  FROM sl GROUP BY 1)
       |SELECT media_id, n_frames, n_cuts, n_shots, max_shot_len
       |FROM agg1 JOIN agg2 USING (media_id)
       |ORDER BY media_id""".stripMargin

  /** q236 oracle: the q233 pair CTEs folded to components by recursive
    * reachability (q47's dedupGroups pattern) — min reachable id per node
    * == the distributed label propagation's canonical keeper. */
  private lazy val imageDedupGroupsOracleSql: String =
    s"""WITH RECURSIVE $dhashPairsCtes,
       |allp AS (
       |  SELECT id_a, id_b FROM cross_pairs
       |  UNION ALL SELECT id_a, id_b FROM within),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM allp
       |  UNION SELECT id_b, id_a FROM allp),
       |walk(id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id)
       |SELECT id, min(lbl) AS component FROM walk GROUP BY id ORDER BY id""".stripMargin

  /** q232 oracle: the q48 quantization replay, projected through the SAME
    * splitmix ±1 literals the Spark plan carries (both sides inline
    * [[graft.operators.Similarity.jlSigns]]'s output — that IS the replay
    * guarantee), full-dim and projected top-5 chains, overlap per probe. */
  private lazy val jlRecallOracleSql: String = {
    val dims = Seq(8, 16, 32)
    def projCte(d: Int): String = {
      val projList = Similarity.jlSigns(d, 64)
        .map(row => s"list_dot_product(v, [${row.map(x => s"$x.0").mkString(",")}])")
        .mkString(",\n      ")
      s"""p$d AS (
         |  SELECT vec_id, [
         |      $projList] AS v
         |  FROM q)""".stripMargin
    }
    def topkCte(src: String, out: String): String =
      s"""$out AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
         |        list_dot_product(a.v, b.v)
         |          / (sqrt(list_dot_product(a.v, a.v))
         |             * sqrt(list_dot_product(b.v, b.v))) DESC,
         |        b.vec_id) AS r
         |    FROM $src a JOIN $src b ON a.vec_id < 10 AND a.vec_id <> b.vec_id) z
         |  WHERE r <= 5)""".stripMargin
    val dimBlocks = dims.map { d =>
      s"""SELECT f.query_id, $d AS dim,
         |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_overlap,
         |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / 5 AS recall
         |FROM fullk f LEFT JOIN projk$d t
         |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
         |GROUP BY f.query_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x))) AS ma
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |    CASE WHEN ma > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
       |           AS DOUBLE))
       |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
       |  FROM e),
       |${dims.map(projCte).mkString(",\n")},
       |${topkCte("q", "fullk")},
       |${dims.map(d => topkCte(s"p$d", s"projk$d")).mkString(",\n")}
       |$dimBlocks
       |ORDER BY query_id, dim""".stripMargin
  }

  /** Shared CTE body replaying the IVF all-queries top-5 chain
    * (q171/q133/q139/q175): head centroids with nlist=⌈√n⌉, one
    * assignment CTE serving corpus bucketing (r=1) and probe lists
    * (r<=4), ends at `topk(qid, nid, rank)`. */
  private lazy val ivfTopkSqlCte: String =
    """cents AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
      |  FROM embeddings ORDER BY vec_id
      |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
      |asg AS (
      |  SELECT e.vec_id AS id, e.embedding AS vec, c.cent_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
      |  FROM embeddings e, cents c),
      |bucketed AS (SELECT id AS nid, vec, cent_id AS bucket FROM asg WHERE r = 1),
      |probes AS (SELECT id AS qid, vec AS qv, cent_id AS bucket FROM asg WHERE r <= 4),
      |scored AS (
      |  SELECT p.qid, b.nid, list_cosine_similarity(p.qv, b.vec) AS cos
      |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket AND p.qid <> b.nid),
      |topk AS (
      |  SELECT qid, nid, rank FROM (
      |    SELECT qid, nid, row_number() OVER (
      |      PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      |    FROM scored) WHERE rank <= 5)""".stripMargin

  /** [[ivfTopkSqlCte]] extended to the reciprocal edge set
    * `mut(id_a, id_b, rank_ab, rank_ba)`, id_a < id_b. */
  private lazy val ivfMutualSqlCte: String =
    s"""$ivfTopkSqlCte,
       |mut AS (
       |  SELECT f.qid AS id_a, f.nid AS id_b, f.rank AS rank_ab, r.rank AS rank_ba
       |  FROM topk f JOIN topk r ON r.qid = f.nid AND r.nid = f.qid
       |  WHERE f.qid < f.nid)""".stripMargin

  /** Gonzalez k-center oracle CTE builder (q172/q184): the unrolled 4
    * selection rounds over `embeddings` rows passing `whereSql` (empty =
    * all), in the double-precision dot-product domain (bit-parity with the
    * native cosine; DuckDB's list_cosine_similarity is float32 and only
    * rank-safe). Ends at `e(vec_id, v, nrm)` (the filtered point set) and
    * `cents(rnk, cid, cv, cn)`. */
  private def kcenterSqlCte(whereSql: String): String =
    s"""emb2 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings $whereSql),
       |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2),
       |seed AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
       |         ORDER BY vec_id LIMIT 1),
       |d1 AS (
       |  SELECT p.vec_id, p.v, p.nrm,
       |         1.0 - list_dot_product(p.v, s.cv) / (p.nrm * s.cn) AS md
       |  FROM e p, seed s),
       |c2 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d1
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |d2 AS (SELECT d.vec_id, d.v, d.nrm,
       |         least(d.md,
       |           1.0 - list_dot_product(d.v, c.cv) / (d.nrm * c.cn)) AS md
       |       FROM d1 d, c2 c),
       |c3 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d2
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |d3 AS (SELECT d.vec_id, d.v, d.nrm,
       |         least(d.md,
       |           1.0 - list_dot_product(d.v, c.cv) / (d.nrm * c.cn)) AS md
       |       FROM d2 d, c3 c),
       |c4 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM d3
       |       ORDER BY md DESC, vec_id LIMIT 1),
       |cents AS (
       |  SELECT 0 AS rnk, cid, cv, cn FROM seed
       |  UNION ALL SELECT 1, cid, cv, cn FROM c2
       |  UNION ALL SELECT 2, cid, cv, cn FROM c3
       |  UNION ALL SELECT 3, cid, cv, cn FROM c4)""".stripMargin

  /** Shared CTE body recomputing the portable 60-bit simhash table in SQL
    * (token md5Hash60 -> per-bit +/-1 balances -> bit assembly). */
  /** Shared CTE replaying the CDC boundary/span pipeline (q78/q79): ends
    * at `chunks(doc_id, t, sp, ep)`. */
  private lazy val cdcChunksSqlCte: String = {
    val P = graft.functions.PortableHash.P31
    val B = graft.operators.Chunking.RollBase
    val tok = graft.functions.PortableHash.md5Hash60Sql("s")
    // Horner fold over the 4-token window ending at i (same mod-each-step
    // order as the Spark side's zip_with chain)
    val wh = (1 until 4).foldLeft("h[i - 3]") { (acc, k) =>
      s"((($acc) * $B + h[i - ${3 - k}]) % $P)"
    }
    s"""d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    list_transform(t, s -> ($tok % $P)) AS h
       |  FROM d),
       |b AS (
       |  SELECT doc_id, t, n,
       |    CASE WHEN n >= 4 THEN
       |      list_filter(generate_series(4, n), i -> (($wh) % 64) = 0)
       |    ELSE [] END AS bpos
       |  FROM base),
       |s AS (
       |  SELECT doc_id, t, n,
       |    list_prepend(1, list_transform(bpos, x -> x + 1)) AS ss,
       |    list_append(bpos, n) AS es
       |  FROM b),
       |chunks AS (
       |  SELECT doc_id, t, ss[ci] AS sp, es[ci] AS ep
       |  FROM s, unnest(generate_series(1, len(ss))) AS u(ci)
       |  WHERE ss[ci] <= es[ci])""".stripMargin
  }

  private lazy val cdcChunkHashSql: String =
    graft.functions.PortableHash.md5Hash60Sql("array_to_string(t[sp:ep], ' ')")

  private lazy val simhashSqlCte: String = {
    val bits = 60
    val bals = (0 until bits)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n    ")
    val assemble = (0 until bits)
      .map(i => s"CASE WHEN b$i > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END")
      .mkString("\n    + ")
    s"""toks AS (
       |  SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT id, ${PortableHash.md5Hash60Sql("tok")} AS h FROM toks),
       |bal AS (SELECT id, $bals FROM h GROUP BY id),
       |sim AS (SELECT id, $assemble AS simhash FROM bal)""".stripMargin
  }

  /** q33 oracle: replay the hyperplane band keys (same float-rounded plane
    * literals, sign of dot == sign of cosine), bucket-size gate, then exact
    * double cosine over candidate pairs. */
  /** Shared q33/q235 CTE: the hyperplane band keys replayed from the SAME
    * splitmix plane literals the Spark plan inlines — `e` (doubled
    * vectors) + `banded` (id, bno, bk). */
  private lazy val hyperplaneBandedCte: String = {
    val dim = 64; val numBands = 4; val bandBits = 6
    def planeSql(p: Int): String =
      (0 until dim).map(i => Dedup.planeCoeff(p, i).toDouble.toString)
        .mkString("[", ", ", "]")
    def bandKeySql(b: Int): String =
      (0 until bandBits).map { bit =>
        s"CASE WHEN list_dot_product(v, ${planeSql(b * bandBits + bit)}) > 0 THEN ${1L << bit} ELSE 0 END"
      }.mkString("\n    + ")
    val bandSelects = (0 until numBands).map(b =>
      s"SELECT vec_id AS id, $b AS bno,\n    ${bandKeySql(b)} AS bk FROM e")
      .mkString("\n  UNION ALL\n  ")
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |banded AS (
       |  $bandSelects)""".stripMargin
  }

  /** q235 oracle: occupancy rollup over the shared band CTE — the same
    * (bno, bk) buckets q33's harvest expands. */
  private lazy val hyperplaneStatsOracleSql: String =
    s"""WITH $hyperplaneBandedCte,
       |occ AS (
       |  SELECT bno, bk, CAST(COUNT(*) AS BIGINT) AS occ
       |  FROM banded GROUP BY 1, 2)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |  CAST(SUM(occ) AS BIGINT) AS n_vec_band_rows,
       |  CAST(MAX(occ) AS BIGINT) AS max_occ,
       |  CAST(COALESCE(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_multi_buckets,
       |  CAST(COALESCE(SUM((occ * (occ - 1)) // 2), 0) AS BIGINT) AS pair_work
       |FROM occ""".stripMargin

  /** q246 oracle: the q33 algebra with the band width DERIVED from the
    * corpus count — bits = smallest b in [6, 24] with n ≤ 32·2^b (pure
    * integer comparison, mirroring [[Dedup.autoBandBits]] exactly), each
    * of the 24 per-band bit terms gated on `bit < bits`, planes drawn
    * from the fixed stride-24 layout the Spark side uses. */
  private lazy val hyperplaneAutoOracleSql: String = {
    val dim = 64; val numBands = 4; val stride = 24
    def planeSql(p: Int): String =
      (0 until dim).map(i => Dedup.planeCoeff(p, i).toDouble.toString)
        .mkString("[", ", ", "]")
    def bandKeySql(b: Int): String =
      (0 until stride).map { bit =>
        s"CASE WHEN $bit < bits AND list_dot_product(v, ${planeSql(b * stride + bit)}) > 0 THEN ${1L << bit} ELSE 0 END"
      }.mkString("\n    + ")
    val bandSelects = (0 until numBands).map(b =>
      s"SELECT vec_id AS id, $b AS bno,\n    ${bandKeySql(b)} AS bk FROM e, nb")
      .mkString("\n  UNION ALL\n  ")
    val bitRows = (6 to 24).map(b => s"($b)").mkString(", ")
    s"""WITH nb AS (
       |  SELECT COALESCE(MIN(b), 24) AS bits
       |  FROM (VALUES $bitRows) t(b),
       |       (SELECT COUNT(*) AS n FROM embeddings) c
       |  WHERE c.n <= 32 * (CAST(1 AS BIGINT) << b)),
       |e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |banded AS (
       |  $bandSelects),
       |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz FROM banded),
       |pp AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |scored AS (
       |  SELECT id_a, id_b,
       |    list_dot_product(ea.v, eb.v)
       |      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS c
       |  FROM pp JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
       |SELECT id_a, id_b, CAST(c AS FLOAT) AS cos
       |FROM scored WHERE c >= CAST(0.3 AS DOUBLE)
       |ORDER BY id_a, id_b""".stripMargin
  }

  private lazy val embNearDupOracleSql: String = {
    s"""WITH $hyperplaneBandedCte,
       |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bno, bk) AS bsz FROM banded),
       |pp AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM sized a JOIN sized b ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
       |  WHERE a.bsz BETWEEN 2 AND 1000),
       |scored AS (
       |  SELECT id_a, id_b,
       |    list_dot_product(ea.v, eb.v)
       |      / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS c
       |  FROM pp JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
       |SELECT id_a, id_b, CAST(c AS FLOAT) AS cos
       |FROM scored WHERE c >= CAST(0.3 AS DOUBLE)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** One oracle, two engines-side algorithms (q85 md5-60 window screen,
    * q116 hash-free prefix doubling): the DuckDB brute-force duplicated
    * 8-token-window formulation both must match exactly. */
  private val dupSpanRangesOracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |win AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS sp, array_to_string(t[i:i+7], ' ') AS s
      |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
      |  WHERE len(t) >= 8),
      |duph AS (
      |  SELECT s FROM (SELECT s, doc_id FROM win GROUP BY 1, 2)
      |  GROUP BY s HAVING COUNT(*) >= 2),
      |dup AS (SELECT doc_id, sp FROM win WHERE s IN (SELECT s FROM duph)),
      |isl AS (
      |  SELECT doc_id, sp,
      |    SUM(CASE WHEN psp IS NULL OR sp - psp > 8 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY sp) AS island
      |  FROM (SELECT doc_id, sp,
      |          LAG(sp) OVER (PARTITION BY doc_id ORDER BY sp) AS psp
      |        FROM dup))
      |SELECT doc_id, CAST(MIN(sp) AS BIGINT) AS span_start,
      |  CAST(MAX(sp) + 7 AS BIGINT) AS span_end,
      |  CAST(MAX(sp) + 7 - MIN(sp) + 1 AS BIGINT) AS span_tokens
      |FROM isl GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** Shared q209/q210 oracle chain: q81's per-vector int8 quantization,
    * the FULL (i, j) Gram matrix in HUGEINT, and 8 unrolled rounds of the
    * integer-exact power recurrence (v fixed-point at 2^20; the division
    * only ever sees non-negative operands so DuckDB `//` replays the
    * BigInt quotient exactly — the q120 unrolled-fixed-point idiom). */
  private lazy val pcaChainSql: String = {
    // MATERIALIZED is load-bearing: v_k references u_k twice (matvec +
    // max), so default CTE inlining would double the expansion per
    // iteration (the q214 fd-exhaustion lesson)
    val steps = (1 to 8).map { k =>
      s"""u$k AS MATERIALIZED (SELECT g.i AS dim, SUM(g.g * p.val) AS u
         |  FROM g JOIN v${k - 1} p ON p.dim = g.j GROUP BY 1),
         |m$k AS (SELECT GREATEST(MAX(ABS(u)), 1) AS ma FROM u$k),
         |v$k AS MATERIALIZED (SELECT dim,
         |    CASE WHEN u >= 0 THEN (u * 1048576) // ma
         |         ELSE -(((-u) * 1048576) // ma) END AS val
         |  FROM u$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(x))) AS ma
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id,
       |    CASE WHEN ma > 0 THEN list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
       |           AS BIGINT))
       |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
       |  FROM e),
       |g AS MATERIALIZED (
       |  SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       |    CAST(SUM(v[i + 1] * v[j + 1]) AS HUGEINT) AS g
       |  FROM q, range(64) r1(i), range(64) r2(j)
       |  GROUP BY 1, 2),
       |v0 AS MATERIALIZED (
       |  SELECT CAST(i AS INTEGER) AS dim, CAST(1048576 AS HUGEINT) AS val
       |  FROM range(64) r(i)),
       |$steps""".stripMargin
  }

  /** Shared q250/q251 judgment synthesis: the SparkEntry.prefJudgments
    * law replayed verbatim — portable 60-bit md5 draws for both item
    * positions and the winner roll, the generating law an exact integer
    * Bradley–Terry with latent strength item+1. `fa`/`fb` are the
    * positions-as-shown (q251's bias read needs them). */
  private def prefJudgmentCtes: String = {
    def h(tag: String) =
      PortableHash.md5Hash60Sql(s"CAST(event_id AS VARCHAR) || '$tag'")
    s"""ab AS MATERIALIZED (
       |  SELECT event_id, user_id,
       |    ${h(":pa")} % 50 AS a,
       |    ${h(":pb")} % 49 AS b0,
       |    ${h(":pw")} AS wroll
       |  FROM events),
       |jd AS MATERIALIZED (
       |  SELECT event_id, user_id, a AS fa,
       |    CASE WHEN b0 >= a THEN b0 + 1 ELSE b0 END AS fb,
       |    CASE WHEN wroll % (a + (CASE WHEN b0 >= a THEN b0 + 1 ELSE b0 END) + 2)
       |              < a + 1
       |         THEN a ELSE CASE WHEN b0 >= a THEN b0 + 1 ELSE b0 END END AS winner
       |  FROM ab)""".stripMargin
  }

  /** q250 oracle: the Hunter-2004 MM recurrence unrolled 5 rounds in the
    * q120 integer-fixed-point idiom — SCALE=1e6, every division a floor
    * division, every sum CAST back to BIGINT (DuckDB SUM(BIGINT) widens
    * to HUGEINT; Spark stays Long), renormalized to mean SCALE with a
    * floor of 1 each round, exactly [[graft.operators.Preference
    * .bradleyTerryFixedPoint]]'s contract. */
  /** The full BT fit chain as CTEs — judgment synthesis through the 5
    * unrolled MM rounds, ending in `s5(item, score)` (plus `it`, `jd`
    * for downstream reuse). ONE copy feeds both the q250 fit readout
    * and the q252 calibration that scores judgments against the fit
    * (the aHashPairAlgebraCtes lesson: a recurrence constant hand-
    * duplicated across oracles silently diverges). */
  private def btChainCtes: String = {
    val iters = (1 to 5).map { k =>
      val prev = s"s${k - 1}"
      s"""d$k AS MATERIALIZED (
         |  SELECT sym.i AS item,
         |    CAST(SUM(sym.n * 1000000000000 // (si.score + sj.score)) AS BIGINT)
         |      AS denom
         |  FROM sym JOIN $prev si ON si.item = sym.i
         |  JOIN $prev sj ON sj.item = sym.j
         |  GROUP BY 1),
         |r$k AS MATERIALIZED (
         |  SELECT it.item, it.wins * 1000000000000 // d$k.denom AS raw
         |  FROM it JOIN d$k ON d$k.item = it.item),
         |t$k AS (SELECT CAST(SUM(raw) AS BIGINT) AS total FROM r$k),
         |s$k AS MATERIALIZED (
         |  SELECT item, GREATEST(raw * (nn.n * 1000000) // t$k.total, 1) AS score
         |  FROM r$k, t$k, nn)""".stripMargin
    }.mkString(",\n")
    s"""$prefJudgmentCtes,
       |pl AS MATERIALIZED (
       |  SELECT winner AS w, CASE WHEN winner = fa THEN fb ELSE fa END AS l
       |  FROM jd),
       |wins AS MATERIALIZED (SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS wins
       |         FROM pl GROUP BY 1),
       |sym AS MATERIALIZED (
       |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |    SELECT w AS i, l AS j FROM pl UNION ALL SELECT l, w FROM pl)
       |  GROUP BY 1, 2),
       |it AS MATERIALIZED (
       |  SELECT items.item, COALESCE(wins.wins, 0) AS wins
       |  FROM (SELECT DISTINCT i AS item FROM sym) items
       |  LEFT JOIN wins ON wins.item = items.item),
       |nn AS (SELECT COUNT(*) AS n FROM it),
       |s0 AS MATERIALIZED (SELECT item, CAST(1000000 AS BIGINT) AS score FROM it),
       |$iters""".stripMargin
  }

  private def bradleyTerryOracleSql: String =
    s"""WITH $btChainCtes
       |SELECT it.item, it.wins, s5.score,
       |  ROW_NUMBER() OVER (ORDER BY s5.score DESC, it.item) AS rank
       |FROM it JOIN s5 ON s5.item = it.item
       |ORDER BY rank""".stripMargin

  /** q252 oracle: the shared BT chain scored back onto the judgments —
    * predicted lo-win ppm per pair from s5, 10 predicted-probability
    * buckets, observed vs mean-predicted basis points, all floor
    * division. */
  private def prefCalibrationOracleSql: String =
    s"""WITH $btChainCtes,
       |cal AS (
       |  SELECT LEAST(fa, fb) AS lo, GREATEST(fa, fb) AS hi,
       |    CASE WHEN winner = LEAST(fa, fb) THEN 1 ELSE 0 END AS lo_win
       |  FROM jd),
       |pp AS (
       |  SELECT cal.lo_win,
       |    slo.score * 1000000 // (slo.score + shi.score) AS ppm
       |  FROM cal JOIN s5 slo ON slo.item = cal.lo
       |  JOIN s5 shi ON shi.item = cal.hi),
       |b AS (
       |  SELECT ppm * 10 // 1000000 AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n_judgments,
       |    CAST(SUM(lo_win) AS BIGINT) AS lo_wins,
       |    CAST(SUM(ppm) AS BIGINT) AS sum_ppm
       |  FROM pp GROUP BY 1)
       |SELECT bucket, n_judgments, lo_wins,
       |  lo_wins * 10000 // n_judgments AS obs_bp,
       |  sum_ppm * 10000 // (n_judgments * 1000000) AS avg_pred_bp,
       |  ABS(lo_wins * 10000 // n_judgments
       |      - sum_ppm * 10000 // (n_judgments * 1000000)) AS gap_bp
       |FROM b ORDER BY bucket""".stripMargin

  /** q251 oracle: pair-majority verdicts (tie → smaller id) joined back
    * onto the judgment rows, per-annotator counts and floor-division
    * basis points — all BIGINT. */
  private def annotatorAuditOracleSql: String =
    s"""WITH $prefJudgmentCtes,
       |pm AS (
       |  SELECT LEAST(fa, fb) AS lo, GREATEST(fa, fb) AS hi,
       |    CAST(SUM(CASE WHEN winner = LEAST(fa, fb) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS lo_wins,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM jd GROUP BY 1, 2),
       |mj AS (
       |  SELECT lo, hi,
       |    CASE WHEN lo_wins * 2 >= n THEN lo ELSE hi END AS majority
       |  FROM pm),
       |base AS (
       |  SELECT jd.user_id AS annotator,
       |    CAST(COUNT(*) AS BIGINT) AS n_judgments,
       |    CAST(SUM(CASE WHEN jd.winner = mj.majority THEN 1 ELSE 0 END)
       |      AS BIGINT) AS agree_cnt,
       |    CAST(SUM(CASE WHEN jd.winner = jd.fa THEN 1 ELSE 0 END)
       |      AS BIGINT) AS first_wins
       |  FROM jd JOIN mj
       |    ON mj.lo = LEAST(jd.fa, jd.fb) AND mj.hi = GREATEST(jd.fa, jd.fb)
       |  GROUP BY 1)
       |SELECT annotator, n_judgments, agree_cnt,
       |  agree_cnt * 10000 // n_judgments AS agree_bp,
       |  first_wins, first_wins * 10000 // n_judgments AS first_bp
       |FROM base ORDER BY annotator""".stripMargin

  /** q254 oracle: the GRPO group-advantage algebra replayed — 16-wide
    * prompt groups from event_id, per-group exact Long sums, isqrt as
    * corrected floor(sqrt) (the q137 idiom), every signed division in
    * sign-magnitude form so `//` == Spark's `div` on the non-negative
    * magnitude. */
  private def grpoAdvantageOracleSql: String = {
    def h(tag: String) =
      PortableHash.md5Hash60Sql(s"CAST(event_id AS VARCHAR) || '$tag'")
    s"""WITH r AS MATERIALIZED (
       |  SELECT CAST(event_id AS BIGINT) AS id,
       |    CAST(event_id AS BIGINT) // 16 AS grp,
       |    (CAST(event_id AS BIGINT) // 16) % 7 * 200
       |      + ${h(":rw")} % 1000 AS reward
       |  FROM events),
       |st AS MATERIALIZED (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(reward) AS BIGINT) AS sr,
       |    CAST(SUM(reward * reward) AS BIGINT) AS sr2
       |  FROM r GROUP BY 1),
       |v AS (
       |  SELECT r.id, r.grp, r.reward, st.n, st.sr,
       |    st.n * st.sr2 - st.sr * st.sr AS var_num
       |  FROM r JOIN st ON st.grp = r.grp),
       |sq AS (
       |  SELECT id, grp, reward, n, sr,
       |    var_num * 1000000 // (n * n) AS x,
       |    CAST(floor(sqrt(CAST(var_num * 1000000 // (n * n) AS DOUBLE)))
       |      AS BIGINT) AS s0
       |  FROM v),
       |sc AS (
       |  SELECT id, grp, reward, n, sr, x,
       |    CASE WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS s1
       |  FROM sq),
       |sd AS (
       |  SELECT id, grp, reward, n, sr,
       |    CASE WHEN (s1 + 1) * (s1 + 1) <= x THEN s1 + 1 ELSE s1 END
       |      AS std_milli
       |  FROM sc)
       |SELECT id, grp, reward, n AS grp_n,
       |  CASE WHEN sr < 0 THEN -(ABS(sr) * 1000000 // n)
       |       ELSE sr * 1000000 // n END AS mean_fp,
       |  std_milli,
       |  CASE WHEN reward * n - sr < 0
       |    THEN -(ABS(reward * n - sr) * 1000000000
       |           // (n * GREATEST(std_milli, 1)))
       |    ELSE (reward * n - sr) * 1000000000
       |         // (n * GREATEST(std_milli, 1)) END AS adv_fp
       |FROM sd ORDER BY id""".stripMargin
  }

  /** q255 oracle: the hard-sigmoid logistic fit unrolled — q41's feature
    * fragments floored into [0,100], the linear label law, 5 GD rounds
    * each one aggregate (weights as one-row CTEs, the q120/q250 unrolled-
    * fixed-point idiom, sign-magnitude divisions throughout), then the
    * reliability-decile readout. iterations/lrDen match the builder
    * (single source for both constants below). */
  private def qualityLrOracleSql: String = {
    val iterN = 12  // LOCKSTEP with SparkEntry.qualityLrQ's iterations
    val lrDen = 5   // LOCKSTEP with SparkEntry.qualityLrQ's lrDen
    val stop = Seq("the", "a", "and", "of")
    val zExpr = (w: String) =>
      s"$w.b + $w.w1 * fy.x1 + $w.w2 * fy.x2 + $w.w3 * fy.x3 + $w.w4 * fy.x4"
    val pOfZ =
      """GREATEST(0, LEAST(1000000, 500000 +
        |      CASE WHEN z < 0 THEN -(ABS(z) // 4) ELSE z // 4 END))""".stripMargin
    def step(g: String) =
      s"CASE WHEN $g < 0 THEN -(ABS($g) // (g.n * $lrDen)) " +
        s"ELSE $g // (g.n * $lrDen) END"
    val iters = (1 to iterN).map { k =>
      val w = s"w${k - 1}"
      s"""z$k AS (
         |  SELECT fy.y, fy.x1, fy.x2, fy.x3, fy.x4,
         |    ${zExpr("w")} AS z
         |  FROM fc fy, $w w),
         |p$k AS (
         |  SELECT y, x1, x2, x3, x4,
         |    y * 1000000 - $pOfZ AS resid
         |  FROM z$k),
         |g$k AS (
         |  SELECT CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS n,
         |    CAST(SUM(resid) AS BIGINT) AS g0,
         |    CAST(SUM(x1 * resid) AS BIGINT) AS g1,
         |    CAST(SUM(x2 * resid) AS BIGINT) AS g2,
         |    CAST(SUM(x3 * resid) AS BIGINT) AS g3,
         |    CAST(SUM(x4 * resid) AS BIGINT) AS g4
         |  FROM p$k),
         |w$k AS MATERIALIZED (
         |  SELECT w.b + ${step("g.g0")} AS b,
         |    w.w1 + ${step("g.g1")} AS w1,
         |    w.w2 + ${step("g.g2")} AS w2,
         |    w.w3 + ${step("g.g3")} AS w3,
         |    w.w4 + ${step("g.g4")} AS w4
         |  FROM $w w, g$k g)""".stripMargin
    }.mkString(",\n")
    s"""WITH fr AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
       |      AS n_nonspace,
       |    CAST(${qHits(stop)} AS BIGINT) AS stop_hits,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       |      AS BIGINT) AS n_digits
       |  FROM documents),
       |fx AS (
       |  SELECT doc_id,
       |    LEAST(n_tokens, 500) // 5 AS x1,
       |    stop_hits * 100 // GREATEST(n_tokens, 1) AS x2,
       |    n_digits * 100 // GREATEST(n_chars, 1) AS x3,
       |    LEAST(n_nonspace // GREATEST(n_tokens, 1), 100) AS x4
       |  FROM fr),
       |fy AS MATERIALIZED (
       |  SELECT doc_id, x1, x2, x3, x4,
       |    CASE WHEN ${PortableHash.md5Hash60Sql(
      "CAST(doc_id AS VARCHAR) || ':ql'")} % 200 <
       |      GREATEST(0, LEAST(200, 15 * (x1 + x2) - 120))
       |    THEN 1 ELSE 0 END AS y
       |  FROM fx),
       |mn AS (
       |  SELECT CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |    CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x4) AS BIGINT) AS s4
       |  FROM fy),
       |fc AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    x1 - mn.s1 // mn.n AS x1, x2 - mn.s2 // mn.n AS x2,
       |    x3 - mn.s3 // mn.n AS x3, x4 - mn.s4 // mn.n AS x4
       |  FROM fy, mn),
       |w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS w1,
       |       CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
       |       CAST(0 AS BIGINT) AS w4),
       |$iters,
       |zs AS (SELECT fy.y, ${zExpr("w")} AS z FROM fc fy, w$iterN w),
       |ps AS (SELECT y, $pOfZ AS p FROM zs),
       |d AS (
       |  SELECT LEAST(p * 10 // 1000000, 9) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS positives,
       |    CAST(SUM(p) AS BIGINT) AS sum_p
       |  FROM ps GROUP BY 1)
       |SELECT bucket, n, positives,
       |  positives * 10000 // n AS pos_bp,
       |  sum_p * 10000 // (n * 1000000) AS avg_pred_bp
       |FROM d ORDER BY bucket""".stripMargin
  }

  /** q256 oracle: the linearized DoReMi multiplicative-weights rounds
    * unrolled over the bounded domain aggregate — uniform ppm start,
    * mixture-weighted baseline, clamped factor, renormalize-with-floor,
    * exactly [[graft.operators.Mixing.excessLossMixPpm]]'s Long
    * sequence (sorted-domain iteration order is irrelevant: every round
    * is a set-wise map + two order-independent integer sums). */
  private def doremiMixOracleSql: String = {
    def h(expr: String) = PortableHash.md5Hash60Sql(expr)
    val rounds = (1 to 5).map { k =>
      val prev = s"a${k - 1}"
      s"""b$k AS (
         |  SELECT CAST(SUM(p.a * me.me) AS BIGINT)
         |    // GREATEST(CAST(SUM(p.a) AS BIGINT), 1) AS bl
         |  FROM $prev p JOIN me ON me.domain = p.domain),
         |f$k AS (
         |  SELECT p.domain,
         |    p.a * GREATEST(10000, LEAST(2000000,
         |      1000000 + CASE WHEN me.me - b$k.bl < 0
         |        THEN -(ABS(me.me - b$k.bl) // 10000)
         |        ELSE (me.me - b$k.bl) // 10000 END)) // 1000000 AS a
         |  FROM $prev p JOIN me ON me.domain = p.domain, b$k),
         |s$k AS (SELECT GREATEST(CAST(SUM(a) AS BIGINT), 1) AS t FROM f$k),
         |a$k AS MATERIALIZED (
         |  SELECT domain, GREATEST(a * 1000000 // t, 1) AS a
         |  FROM f$k, s$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH pd AS (
       |  SELECT lang AS domain,
       |    ${h("lang || ':base'")} % 2000 + 800
       |      + ${h("CAST(doc_id AS VARCHAR) || ':ls'")} % 400 AS loss,
       |    1500 + ${h("CAST(doc_id AS VARCHAR) || ':lr'")} % 400 AS ref
       |  FROM documents),
       |ag AS (
       |  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(GREATEST(loss - ref, 0)) AS BIGINT) AS se
       |  FROM pd GROUP BY 1),
       |me AS MATERIALIZED (
       |  SELECT domain, n, se * 1000000 // GREATEST(n, 1) AS me FROM ag),
       |dc AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM me),
       |a0 AS (SELECT domain, 1000000 // dc.c AS a FROM me, dc),
       |$rounds
       |SELECT me.domain, me.n AS n_docs, me.me AS mean_excess_fp,
       |  a5.a AS weight_ppm,
       |  ROW_NUMBER() OVER (ORDER BY a5.a DESC, me.domain) AS rank
       |FROM me JOIN a5 ON a5.domain = me.domain
       |ORDER BY me.domain""".stripMargin
  }

  /** q17/q253 oracle: head-init codebook, nearest-centroid assignment,
    * nprobe-4 probe, per-query cosine top-5 — rank-only output. q253 is
    * the STORE-SERVED twin (the persisted incremental index must answer
    * exactly what the batch rebuild answers), so one replay serves both
    * registry rows. */
  private val cosineIvfOracleSql: String =
    """WITH cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
        |  FROM embeddings ORDER BY vec_id LIMIT 16),
        |corpus_assign AS (
        |  SELECT e.vec_id AS nid, e.embedding AS vec, c.cent_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |  FROM embeddings e, cents c),
        |bucketed AS (SELECT nid, vec, cent_id AS bucket FROM corpus_assign WHERE r = 1),
        |probes AS (
        |  SELECT qid, qv, bucket FROM (
        |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cent_id AS bucket,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |    FROM embeddings e, cents c WHERE e.vec_id < 10) t
        |  WHERE r <= 4),
        |scored AS (
        |  SELECT p.qid, b.nid, list_cosine_similarity(p.qv, b.vec) AS cos
        |  FROM bucketed b JOIN probes p ON b.bucket = p.bucket AND p.qid <> b.nid)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q209_pca_power" ->
      s"""WITH $pcaChainSql
         |SELECT CAST(v8.dim AS INTEGER) AS dim, CAST(v8.val AS BIGINT) AS loading,
         |  (SELECT CAST(ma // 1048576 AS BIGINT) FROM m8) AS lambda_fp
         |FROM v8 ORDER BY dim""".stripMargin,
    "q210_pca_scores" ->
      s"""WITH $pcaChainSql,
         |sc AS (SELECT q.vec_id,
         |    CAST(SUM(q.v[v8.dim + 1] * v8.val) AS HUGEINT) AS score
         |  FROM q, v8 GROUP BY 1)
         |SELECT CAST(((score + 1099511627776) // 67108864) - 16384 AS BIGINT)
         |    AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(score) AS BIGINT) AS min_score,
         |  CAST(MAX(score) AS BIGINT) AS max_score
         |FROM sc GROUP BY 1 ORDER BY bucket""".stripMargin,
    // the same base hash, affine permutations, thresholds, and
    // exact-integer weighted sums; the band replays through quantile_cont
    // (the q207 kernel-parity contract)
    "q211_bootstrap_ci" -> {
      val h0 = graft.functions.PortableHash.md5Hash60Sql("CAST(event_id AS VARCHAR)")
      val w = graft.operators.Bootstrap.poissonWeightSql("v")
      val coef = graft.operators.Bootstrap.affineCoeffValuesSql(32)
      s"""WITH ev AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         |    $h0 AS h0
         |  FROM events),
         |co(b, ca, cb) AS (VALUES $coef),
         |vx AS (
         |  SELECT event_type, cents, b,
         |    ((ca * (h0 & 2147483647) + cb) % 2147483647) AS v
         |  FROM ev, co),
         |wx AS (SELECT event_type, cents, b, $w AS w FROM vx),
         |reps AS (
         |  SELECT event_type, b,
         |    CAST(SUM(CAST(cents AS HUGEINT) * w) AS DOUBLE)
         |      / CAST(SUM(w) AS DOUBLE) AS mean
         |  FROM wx GROUP BY 1, 2),
         |ci AS (
         |  SELECT event_type, quantile_cont(mean, 0.025) AS lo_cents,
         |    quantile_cont(mean, 0.975) AS hi_cents
         |  FROM reps GROUP BY 1),
         |f AS (
         |  SELECT event_type,
         |    CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS mean_cents
         |  FROM ev GROUP BY 1)
         |SELECT f.event_type, mean_cents, lo_cents, hi_cents
         |FROM f JOIN ci USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    // strict-dominance NOT EXISTS at the aggregated customer grain — the
    // quadratic formulation is fine at oracle scale; the Spark side never
    // builds it
    "q212_skyline" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS BIGINT)
        |      AS total_cents,
        |    CAST(MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
        |      AS last_day,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, total_cents, last_day, n_orders
        |FROM cust c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM cust d
        |  WHERE d.total_cents >= c.total_cents AND d.last_day >= c.last_day
        |    AND d.n_orders >= c.n_orders
        |    AND (d.total_cents > c.total_cents OR d.last_day > c.last_day
        |         OR d.n_orders > c.n_orders))
        |ORDER BY o_custkey""".stripMargin,
    // 2x2 presence counts as exact integers; phi with the identical
    // double association and one IEEE sqrt
    "q213_token_phi" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |pres AS (SELECT DISTINCT doc_id, u.token
        |         FROM d, unnest(w) AS u(token)),
        |tt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM pres
        |       GROUP BY 1 ORDER BY df DESC, token LIMIT 20),
        |lc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl FROM documents GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |aa AS (
        |  SELECT p.token, dd.lang, CAST(COUNT(*) AS BIGINT) AS a
        |  FROM pres p
        |  JOIN documents dd USING (doc_id)
        |  JOIN tt ON tt.token = p.token
        |  GROUP BY 1, 2),
        |cells AS (
        |  SELECT tt.token, lc.lang,
        |    COALESCE(aa.a, 0) AS n_both,
        |    tt.df - COALESCE(aa.a, 0) AS n_token_only,
        |    lc.nl - COALESCE(aa.a, 0) AS n_lang_only,
        |    nn.n - tt.df - lc.nl + COALESCE(aa.a, 0) AS n_neither
        |  FROM tt CROSS JOIN lc CROSS JOIN nn
        |  LEFT JOIN aa ON aa.token = tt.token AND aa.lang = lc.lang)
        |SELECT token, lang, n_both, n_token_only, n_lang_only, n_neither,
        |  CASE WHEN (CAST(n_both + n_token_only AS DOUBLE)
        |               * CAST(n_lang_only + n_neither AS DOUBLE))
        |            * (CAST(n_both + n_lang_only AS DOUBLE)
        |               * CAST(n_token_only + n_neither AS DOUBLE)) > 0
        |    THEN (CAST(n_both AS DOUBLE) * CAST(n_neither AS DOUBLE)
        |          - CAST(n_token_only AS DOUBLE) * CAST(n_lang_only AS DOUBLE))
        |         / sqrt((CAST(n_both + n_token_only AS DOUBLE)
        |                  * CAST(n_lang_only + n_neither AS DOUBLE))
        |                * (CAST(n_both + n_lang_only AS DOUBLE)
        |                   * CAST(n_token_only + n_neither AS DOUBLE)))
        |  END AS phi
        |FROM cells ORDER BY token, lang""".stripMargin,
    // q120's unrolled-fixed-point posture for the HITS recurrence: all
    // operands non-negative, HUGEINT sums, `//` == div
    "q214_hits" -> {
      // MATERIALIZED is load-bearing: each level references its
      // predecessor twice (raw + max), so DuckDB's default CTE inlining
      // doubles the expansion per iteration — 2^8 scans of lineitem
      // exhausts the fd limit before it exhausts patience
      val iters = (1 to 8).map { k =>
        s"""hr$k AS MATERIALIZED (SELECT e.h, SUM(p.s) AS raw FROM ed e
           |  JOIN a${k - 1} p ON p.node = e.a GROUP BY 1),
           |hm$k AS (SELECT GREATEST(MAX(raw), 1) AS m FROM hr$k),
           |h$k AS MATERIALIZED (SELECT h AS node, (raw * 1048576) // m AS s
           |  FROM hr$k, hm$k),
           |ar$k AS MATERIALIZED (SELECT e.a, SUM(p.s) AS raw FROM ed e
           |  JOIN h$k p ON p.node = e.h GROUP BY 1),
           |am$k AS (SELECT GREATEST(MAX(raw), 1) AS m FROM ar$k),
           |a$k AS MATERIALIZED (SELECT a AS node, (raw * 1048576) // m AS s
           |  FROM ar$k, am$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS h, l_partkey AS a FROM lineitem),
         |a0 AS MATERIALIZED (
         |  SELECT DISTINCT a AS node, CAST(1048576 AS HUGEINT) AS s FROM ed),
         |$iters
         |SELECT node AS part, CAST(s AS BIGINT) AS authority_fp
         |FROM a8 ORDER BY authority_fp DESC, part LIMIT 100""".stripMargin
    },
    // q209's quantization + exact integer dots; the greedy unrolls with
    // MATERIALIZED sel sets (each round references the previous twice)
    "q215_mmr_select" -> {
      val rounds = (2 to 10).map { k =>
        s"""m$k AS MATERIALIZED (
           |  SELECT p.id, p.rel, MAX(ps.sim) AS ms
           |  FROM pool p JOIN ps ON ps.ia = p.id
           |    AND ps.ib IN (SELECT id FROM sel${k - 1})
           |  WHERE p.id NOT IN (SELECT id FROM sel${k - 1})
           |  GROUP BY 1, 2),
           |pick$k AS MATERIALIZED (
           |  SELECT $k AS round, id, rel, ms AS max_sim,
           |    7 * rel - 3 * ms AS mmr_fp
           |  FROM m$k ORDER BY mmr_fp DESC, id LIMIT 1),
           |sel$k AS MATERIALIZED (
           |  SELECT * FROM sel${k - 1} UNION ALL SELECT * FROM pick$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |qq AS (SELECT v FROM q WHERE vec_id = 0),
         |relx AS MATERIALIZED (
         |  SELECT q.vec_id AS id, CAST(SUM(q.v[i + 1] * qq.v[i + 1]) AS BIGINT) AS rel
         |  FROM q, qq, range(64) r(i)
         |  WHERE q.vec_id <> 0 GROUP BY 1),
         |pool AS MATERIALIZED (
         |  SELECT id, rel FROM relx ORDER BY rel DESC, id LIMIT 50),
         |ps AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    CAST(SUM(a.v[i + 1] * b.v[i + 1]) AS BIGINT) AS sim
         |  FROM q a JOIN pool pa ON pa.id = a.vec_id
         |  JOIN q b ON a.vec_id <> b.vec_id
         |  JOIN pool pb ON pb.id = b.vec_id, range(64) r(i)
         |  GROUP BY 1, 2),
         |sel1 AS MATERIALIZED (
         |  SELECT 1 AS round, id, rel, CAST(0 AS BIGINT) AS max_sim,
         |    7 * rel AS mmr_fp
         |  FROM pool ORDER BY mmr_fp DESC, id LIMIT 1),
         |$rounds
         |SELECT CAST(round AS INTEGER) AS round, id AS vec_id, rel, max_sim,
         |  mmr_fp
         |FROM sel10 ORDER BY round""".stripMargin
    },
    // q120's unrolled recurrence with seed-gated teleport mass
    "q216_ppr" -> {
      val iters = (1 to 10).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        s"""s$k AS (SELECT d.node, d.outdeg, d.is_seed,
           |  (CASE WHEN d.is_seed THEN 15000000000000 // (100 * nn.ns)
           |        ELSE 0 END)
           |    + (85 * COALESCE(c.s, 0)) // 100 AS score
           |  FROM deg2 d CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst, CAST(SUM(s.score // s.outdeg) AS BIGINT) AS s
           |             FROM ed e JOIN $prev s ON s.node = e.src GROUP BY e.dst) c
           |  ON c.dst = d.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS (SELECT pa AS src, pb AS dst FROM pairs
         |       UNION ALL SELECT pb, pa FROM pairs),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM ed GROUP BY 1),
         |seeds AS (SELECT node FROM deg ORDER BY node LIMIT 5),
         |nn AS (SELECT count(*) AS ns FROM seeds),
         |deg2 AS (SELECT d.node, d.outdeg, (s.node IS NOT NULL) AS is_seed
         |         FROM deg d LEFT JOIN seeds s ON s.node = d.node),
         |s0 AS (SELECT node, outdeg, is_seed,
         |         CASE WHEN is_seed THEN 1000000000000 // nn.ns ELSE 0 END AS score
         |       FROM deg2 CROSS JOIN nn),
         |$iters
         |SELECT node AS part, score FROM s10
         |ORDER BY score DESC, part LIMIT 100""".stripMargin
    },
    // exact HUGEINT degree moments off one edge pass; Newman's r with the
    // identical double association and two IEEE sqrts
    "q217_assortativity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |ed AS (SELECT pa AS src, pb AS dst FROM pairs
        |       UNION ALL SELECT pb, pa FROM pairs),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |        FROM ed GROUP BY 1),
        |ex AS (SELECT dx.deg AS dx, dy.deg AS dy
        |       FROM ed e JOIN deg dx ON dx.node = e.src
        |       JOIN deg dy ON dy.node = e.dst),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
        |        CAST(SUM(dx) AS HUGEINT) AS sx, CAST(SUM(dy) AS HUGEINT) AS sy,
        |        CAST(SUM(dx * dy) AS HUGEINT) AS sxy,
        |        CAST(SUM(dx * dx) AS HUGEINT) AS sxx,
        |        CAST(SUM(dy * dy) AS HUGEINT) AS syy
        |      FROM ex),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |         CAST(MAX(deg) AS BIGINT) AS max_deg FROM deg)
        |SELECT n_nodes, CAST(m AS BIGINT) AS m_edges, max_deg,
        |  CAST(m * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity
        |FROM m, nd""".stripMargin,
    // q209's quantization; 3 unrolled Lloyd rounds — centroids as
    // (cid, dim, val) rows, assignment via (d, cid) row_number, update
    // via sign-split truncating division; MATERIALIZED throughout (each
    // round references its predecessor several times)
    "q218_kmeans_lloyd" -> {
      val rounds = (1 to 3).map { t =>
        s"""ad$t AS MATERIALIZED (
           |  SELECT q.vec_id, c.cid,
           |    SUM((q.v[c.dim + 1] * 1024 - c.val)
           |        * (q.v[c.dim + 1] * 1024 - c.val)) AS d
           |  FROM q CROSS JOIN c${t - 1} c GROUP BY 1, 2),
           |as$t AS MATERIALIZED (
           |  SELECT vec_id, cid, d FROM (
           |    SELECT vec_id, cid, d,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           |    FROM ad$t) z$t WHERE rn = 1),
           |up$t AS MATERIALIZED (
           |  SELECT a.cid, CAST(r.i AS INTEGER) AS dim, SUM(q.v[r.i + 1]) AS sx,
           |    COUNT(*) AS n
           |  FROM as$t a JOIN q ON q.vec_id = a.vec_id, range(64) r(i)
           |  GROUP BY 1, 2),
           |c$t AS MATERIALIZED (
           |  SELECT c.cid, c.dim,
           |    COALESCE(CASE WHEN u.sx >= 0 THEN (u.sx * 1024) // u.n
           |                  ELSE -(((-u.sx) * 1024) // u.n) END, c.val) AS val
           |  FROM c${t - 1} c LEFT JOIN up$t u
           |  ON u.cid = c.cid AND u.dim = c.dim)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |c0 AS MATERIALIZED (
         |  SELECT s.vec_id AS cid, CAST(r.i AS INTEGER) AS dim,
         |    q.v[r.i + 1] * 1024 AS val
         |  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8) s
         |  JOIN q ON q.vec_id = s.vec_id, range(64) r(i)),
         |$rounds,
         |ad4 AS MATERIALIZED (
         |  SELECT q.vec_id, c.cid,
         |    SUM((q.v[c.dim + 1] * 1024 - c.val)
         |        * (q.v[c.dim + 1] * 1024 - c.val)) AS d
         |  FROM q CROSS JOIN c3 c GROUP BY 1, 2),
         |as4 AS MATERIALIZED (
         |  SELECT vec_id, cid, d FROM (
         |    SELECT vec_id, cid, d,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
         |    FROM ad4) z4 WHERE rn = 1)
         |SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS avg_dist2
         |FROM as4 GROUP BY 1 ORDER BY cid""".stripMargin
    },
    // disjoint-algorithm differential: the Spark side thresholds ONE
    // Borůvka forest; the oracle re-derives every threshold's components
    // by recursive reachability on the base graph — agreement is the
    // single-linkage property itself
    "q219_single_linkage" -> {
      val blocks = Seq(2, 3, 5, 8).map { m =>
        s"""ed$m AS (SELECT pa, pb FROM pairs WHERE c >= $m),
           |eb$m AS (SELECT pa AS a, pb AS b FROM ed$m
           |         UNION SELECT pb, pa FROM ed$m),
           |walk$m(id, lbl) AS (
           |  SELECT a, a FROM eb$m
           |  UNION
           |  SELECT e.b, w.lbl FROM walk$m w JOIN eb$m e ON e.a = w.id),
           |cp$m AS (SELECT id, MIN(lbl) AS comp FROM walk$m GROUP BY 1),
           |cs$m AS (SELECT comp, COUNT(*) AS sz FROM cp$m GROUP BY 1),
           |st$m AS (SELECT CAST($m AS BIGINT) AS min_count,
           |  CAST((SELECT n FROM nn)
           |    - (COALESCE((SELECT SUM(sz) FROM cs$m), 0)
           |       - COALESCE((SELECT COUNT(*) FROM cs$m), 0)) AS BIGINT)
           |    AS n_clusters,
           |  CAST(COALESCE((SELECT SUM(sz) FROM cs$m), 0) AS BIGINT)
           |    AS clustered_nodes,
           |  CAST(COALESCE((SELECT MAX(sz) FROM cs$m), 1) AS BIGINT)
           |    AS largest_cluster)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS MATERIALIZED (
         |  SELECT a.p AS pa, b.p AS pb, count(*) AS c FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
         |  (SELECT pa AS x FROM pairs UNION SELECT pb FROM pairs)),
         |$blocks
         |SELECT * FROM st2 UNION ALL SELECT * FROM st3
         |UNION ALL SELECT * FROM st5 UNION ALL SELECT * FROM st8
         |ORDER BY min_count""".stripMargin
    },
    // 6 unrolled min-relaxation rounds; MATERIALIZED because each round
    // references its predecessor twice (carry + relax)
    "q220_bfs_layers" -> {
      val rounds = (1 to 6).map { k =>
        s"""d$k AS MATERIALIZED (
           |  SELECT n.node, LEAST(n.d, COALESCE(r.nd, 999999)) AS d
           |  FROM d${k - 1} n LEFT JOIN
           |    (SELECT e.dst AS node, MIN(p.d + 1) AS nd
           |     FROM ed e JOIN d${k - 1} p ON p.node = e.src GROUP BY 1) r
           |  ON r.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS MATERIALIZED (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM pairs
         |      UNION ALL SELECT pb, pa FROM pairs),
         |nodes AS (SELECT DISTINCT src AS node FROM ed),
         |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 5),
         |d0 AS MATERIALIZED (
         |  SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 0 ELSE 999999 END AS d
         |  FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
         |$rounds
         |SELECT CAST(d AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM d6 GROUP BY 1 ORDER BY hops""".stripMargin
    },
    // one first-appearance table, every curve point a count over it;
    // thresholds replay through quantile_cont (the q207 parity contract)
    "q223_heaps_curve" -> {
      val blocks = Seq(("125", "0.125"), ("25", "0.25"), ("5", "0.5"),
        ("100", "1.0")).map { case (t, p) =>
        s"""c$t AS (SELECT CAST($p AS DOUBLE) AS prob,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents, tq
           |   WHERE CAST(doc_id AS DOUBLE) <= t$t) AS n_docs,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM fd, tq
           |   WHERE CAST(first_doc AS DOUBLE) <= t$t) AS vocab,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM tok, tq
           |   WHERE CAST(doc_id AS DOUBLE) <= t$t) AS occurrences)""".stripMargin
      }.mkString(",\n")
      s"""WITH tok AS MATERIALIZED (
         |  SELECT doc_id, u.token
         |  FROM (SELECT doc_id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS w
         |        FROM documents) d, unnest(w) AS u(token)),
         |fd AS MATERIALIZED (
         |  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
         |tq AS (SELECT
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.125) AS t125,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.25) AS t25,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 0.5) AS t5,
         |    quantile_cont(CAST(doc_id AS DOUBLE), 1.0) AS t100
         |  FROM documents),
         |$blocks
         |SELECT prob, n_docs, vocab, occurrences,
         |  CAST(vocab AS DOUBLE) / CAST(occurrences AS DOUBLE)
         |    AS type_token_ratio
         |FROM (SELECT * FROM c125 UNION ALL SELECT * FROM c25
         |      UNION ALL SELECT * FROM c5 UNION ALL SELECT * FROM c100)
         |ORDER BY prob""".stripMargin
    },
    // a<b<c triangle enumeration on the canonical edge set; the bucket is
    // integer arithmetic end-to-end so no float boundary can flip it
    "q224_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |ed AS MATERIALIZED (SELECT pa AS u, pb AS v FROM pairs),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
        |  (SELECT u AS node FROM ed UNION ALL SELECT v FROM ed) GROUP BY 1),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM ed e1 JOIN ed e2 ON e2.u = e1.v
        |  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM
        |  (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY 1),
        |nt AS (
        |  SELECT d.node, d.degree, COALESCE(pn.t, 0) AS t
        |  FROM deg d LEFT JOIN pn ON pn.node = d.node
        |  WHERE d.degree >= 2)
        |SELECT LEAST((20 * t) // (degree * (degree - 1)), 9) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(t) AS BIGINT) AS sum_triangles
        |FROM nt GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q225_stratified_ate" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS pre,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS post
        |  FROM ev, p GROUP BY 1),
        |g AS (
        |  SELECT CAST(pre // 16384 AS BIGINT) AS band,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_treated,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_control,
        |    SUM(CASE WHEN user_id % 2 = 1 THEN post ELSE 0 END) AS sum_treated,
        |    SUM(CASE WHEN user_id % 2 = 0 THEN post ELSE 0 END) AS sum_control
        |  FROM pu GROUP BY 1)
        |SELECT band, CAST(n_treated AS BIGINT) AS n_treated,
        |  CAST(n_control AS BIGINT) AS n_control,
        |  CAST(sum_treated AS BIGINT) AS sum_treated,
        |  CAST(sum_control AS BIGINT) AS sum_control,
        |  CAST(sum_treated AS DOUBLE) / CAST(n_treated AS DOUBLE)
        |    - CAST(sum_control AS DOUBLE) / CAST(n_control AS DOUBLE)
        |    AS att_cents
        |FROM g WHERE n_treated > 0 AND n_control > 0
        |ORDER BY band""".stripMargin,
    "q226_km_risk_table" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, event_type
        |  FROM events),
        |m AS (SELECT MAX(day) AS maxday FROM ev),
        |pu AS (
        |  SELECT user_id, MIN(day) AS t0,
        |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS cv
        |  FROM ev GROUP BY 1),
        |du AS (
        |  SELECT CASE WHEN cv IS NOT NULL THEN cv - t0
        |              ELSE (SELECT maxday FROM m) - t0 END AS d,
        |    CASE WHEN cv IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM pu),
        |g AS (SELECT d, SUM(e) AS n_event, SUM(1 - e) AS n_censor
        |      FROM du GROUP BY 1),
        |r AS (
        |  SELECT d, n_event, n_censor,
        |    SUM(n_event + n_censor) OVER (
        |      ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS n_risk
        |  FROM g)
        |SELECT CAST(d AS BIGINT) AS duration_days,
        |  CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censor AS BIGINT) AS n_censor,
        |  CAST((n_event * 1000000) // n_risk AS BIGINT) AS hazard_ppm
        |FROM r ORDER BY duration_days""".stripMargin,
    "q227_conformal_coverage" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS x,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
        |  FROM documents),
        |m AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM d WHERE doc_id % 4 < 2),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    CAST(n AS BIGINT) AS n_train FROM fit),
        |cal AS (
        |  SELECT ABS(CAST(y AS DOUBLE)
        |    - (intercept + slope * CAST(x AS DOUBLE))) AS r
        |  FROM d, fit2 WHERE doc_id % 4 = 2),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
        |         CAST((9 * (COUNT(*) + 1) + 9) // 10 AS BIGINT) AS k
        |       FROM cal),
        |q AS (SELECT r AS qhat FROM cal ORDER BY r
        |      LIMIT 1 OFFSET (SELECT k - 1 FROM kk)),
        |te AS (
        |  SELECT ABS(CAST(y AS DOUBLE)
        |    - (intercept + slope * CAST(x AS DOUBLE))) AS r
        |  FROM d, fit2 WHERE doc_id % 4 = 3)
        |SELECT f.n_train, kk.n_cal, kk.k, q.qhat,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN te.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  CAST((SUM(CASE WHEN te.r <= q.qhat THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS coverage_ppm,
        |  f.slope, f.intercept
        |FROM te, fit2 f, kk, q
        |GROUP BY f.n_train, kk.n_cal, kk.k, q.qhat, f.slope, f.intercept"""
        .stripMargin,
    "q228_cusum_change" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |daily AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |          FROM ev GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |    CAST(SUM(x) // COUNT(*) AS BIGINT) AS b,
        |    CAST(GREATEST(1, (SUM(x) // COUNT(*)) // 20) AS BIGINT) AS a,
        |    CAST(GREATEST(1, SUM(x) // COUNT(*)) AS BIGINT) AS h
        |  FROM daily, p WHERE day < p.pivot GROUP BY 1),
        |post AS (
        |  SELECT d.event_type, d.day, b.b, b.a, b.h,
        |    SUM(d.x - b.b - b.a) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        |  FROM daily d JOIN base b USING (event_type), p
        |  WHERE d.day >= p.pivot),
        |cs AS (
        |  SELECT event_type, day, b, a, h,
        |    pp - LEAST(MIN(pp) OVER (
        |      PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s
        |  FROM post)
        |SELECT event_type, b, a, h,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(s) AS BIGINT) AS max_cusum,
        |  MIN(CASE WHEN s > h THEN day END) AS alarm_day,
        |  CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarm_days
        |FROM cs GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,
    // Replays the aHash from the closed-form pixel law gray = (id*31 +
    // x*7 + y*13) % 256 (PNG is lossless, so the Spark side's real
    // ImageIO decode sees exactly these values): 8x8 nearest-neighbor
    // lattice -> floor-mean threshold -> 4x16-bit bands -> band-bucket
    // candidates at the distinct-fingerprint grain -> bit_count(xor)
    // Hamming verify -> group re-expansion. Same algebra as the Spark
    // plan, codec-free.
    "q229_phash_neardup" ->
      s"""WITH img AS (
        |  SELECT doc_id AS media_id,
        |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
        |    CAST(doc_id % 24 + 1 AS INTEGER) AS h,
        |    ${pixelBlockCols("doc_id")}
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT media_id, (js.j * 8 + ii.i) AS p,
        |    (media_id * 31 + ((ii.i * w) // 8) * cx
        |      + ((js.j * h) // 8) * 13 + ph) % 256 AS g
        |  FROM img,
        |    unnest(generate_series(0, 7)) AS ii(i),
        |    unnest(generate_series(0, 7)) AS js(j)),
        |m AS (SELECT media_id, SUM(g) // 64 AS mean FROM px GROUP BY 1),
        |b AS (
        |  SELECT px.media_id, p // 16 AS band,
        |    CAST(SUM(CASE WHEN g >= mean THEN (1 << (p % 16)) ELSE 0 END)
        |      AS INTEGER) AS bk
        |  FROM px JOIN m USING (media_id) GROUP BY 1, 2),
        |hs AS (
        |  SELECT media_id,
        |    MAX(CASE WHEN band = 0 THEN bk END) AS b0,
        |    MAX(CASE WHEN band = 1 THEN bk END) AS b1,
        |    MAX(CASE WHEN band = 2 THEN bk END) AS b2,
        |    MAX(CASE WHEN band = 3 THEN bk END) AS b3
        |  FROM b GROUP BY 1),
        |${aHashPairAlgebraCtes4("")}
        |SELECT id_a, id_b, hamming FROM cross_pairs
        |UNION ALL SELECT id_a, id_b, hamming FROM within
        |ORDER BY id_a, id_b""".stripMargin,
    // the q115/q217 co-purchase edge harvest + brand dim joins; the
    // squared degree-mass ppm term runs in HUGEINT (it overflows BIGINT
    // at ~100x), the doubles are single IEEE ops over exact counts
    "q230_modularity" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS pa, b.p AS pb
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |eb AS (
        |  SELECT e.pa, e.pb, x.p_brand AS ba, y.p_brand AS bb
        |  FROM edges e JOIN part x ON x.p_partkey = e.pa
        |               JOIN part y ON y.p_partkey = e.pb),
        |deg AS (
        |  SELECT node, brand, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT pa AS node, ba AS brand FROM eb
        |    UNION ALL SELECT pb, bb FROM eb) z GROUP BY node, brand),
        |bb AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(deg) AS BIGINT) AS degree_sum
        |  FROM deg GROUP BY brand),
        |wi AS (
        |  SELECT ba AS brand, CAST(COUNT(*) AS BIGINT) AS within_edges
        |  FROM eb WHERE ba = bb GROUP BY ba),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM eb)
        |SELECT b.brand, b.n_nodes, b.degree_sum,
        |  CAST(COALESCE(w.within_edges, 0) AS BIGINT) AS within_edges,
        |  m.m_edges,
        |  CAST((COALESCE(w.within_edges, 0) * 1000000) // m.m_edges
        |    - (CAST(b.degree_sum AS HUGEINT) * b.degree_sum * 1000000)
        |      // (CAST(m.m_edges AS HUGEINT) * m.m_edges * 4)
        |    AS BIGINT) AS contrib_ppm,
        |  CAST(COALESCE(w.within_edges, 0) AS DOUBLE) / CAST(m.m_edges AS DOUBLE)
        |    - (CAST(b.degree_sum AS DOUBLE) / (CAST(m.m_edges AS DOUBLE) * 2.0))
        |      * (CAST(b.degree_sum AS DOUBLE) / (CAST(m.m_edges AS DOUBLE) * 2.0))
        |    AS contrib
        |FROM bb b LEFT JOIN wi w USING (brand), m
        |ORDER BY brand""".stripMargin,
    "q231_split_leakage" -> splitLeakageOracleSql,
    "q232_jl_recall" -> jlRecallOracleSql,
    "q233_dhash_neardup" -> dhashNearDupOracleSql,
    "q234_group_leakage" -> groupLeakageOracleSql,
    "q235_hyperplane_stats" -> hyperplaneStatsOracleSql,
    "q236_image_dedup_groups" -> imageDedupGroupsOracleSql,
    "q237_audio_fingerprint" -> audioFingerprintOracleSql,
    "q238_video_framesig" -> videoFrameSigOracleSql,
    "q239_media_dedup_manifest" -> mediaDedupManifestOracleSql,
    "q240_component_split" -> componentSplitOracleSql,
    "q241_image_caption_cells" -> imageCaptionCellsOracleSql,
    "q242_resize_audit" -> resizeAuditOracleSql,
    "q243_component_keeper" -> qualityKeeperOracleSql,
    "q244_clip_reuse" -> clipReuseOracleSql,
    "q245_resize_robust_dedup" -> resizeRobustOracleSql,
    "q246_hyperplane_auto" -> hyperplaneAutoOracleSql,
    "q247_audio_clip_reuse" -> audioClipReuseOracleSql,
    "q248_scene_cuts" -> sceneCutsOracleSql,
    "q249_audio_clip_autosig" -> audioClipAutoSigOracleSql,
    "q250_bradley_terry" -> bradleyTerryOracleSql,
    "q251_annotator_audit" -> annotatorAuditOracleSql,
    "q252_pref_calibration" -> prefCalibrationOracleSql,
    "q253_ivf_index_store" -> cosineIvfOracleSql,
    "q254_grpo_advantage" -> grpoAdvantageOracleSql,
    "q255_quality_lr" -> qualityLrOracleSql,
    "q256_doremi_mix" -> doremiMixOracleSql,
    // q67's bucket-assignment replay + integer distances + core-4 +
    // mutual-reachability weights, then per-threshold components by
    // recursive reachability (the q219 no-forest differential)
    "q222_hdbscan_profile" -> {
      val blocks = Seq(("25", "0.25"), ("50", "0.5"), ("75", "0.75")).map {
        case (t, p) =>
          s"""eb$t AS (SELECT ia AS a, ib AS b FROM wt, tq
             |         WHERE CAST(w AS DOUBLE) <= t$t
             |         UNION SELECT ib, ia FROM wt, tq
             |         WHERE CAST(w AS DOUBLE) <= t$t),
             |walk$t(id, lbl) AS (
             |  SELECT a, a FROM eb$t
             |  UNION
             |  SELECT e2.b, w2.lbl FROM walk$t w2 JOIN eb$t e2 ON e2.a = w2.id),
             |cp$t AS (SELECT id, MIN(lbl) AS comp FROM walk$t GROUP BY 1),
             |cs$t AS (SELECT comp, COUNT(*) AS sz FROM cp$t GROUP BY 1),
             |st$t AS (SELECT CAST($p AS DOUBLE) AS prob,
             |  (SELECT t$t FROM tq) AS tau,
             |  CAST((SELECT n FROM nn)
             |    - (COALESCE((SELECT SUM(sz) FROM cs$t), 0)
             |       - COALESCE((SELECT COUNT(*) FROM cs$t), 0)) AS BIGINT)
             |    AS n_clusters,
             |  CAST(COALESCE((SELECT SUM(sz) FROM cs$t), 0) AS BIGINT)
             |    AS clustered_nodes,
             |  CAST(COALESCE((SELECT MAX(sz) FROM cs$t), 1) AS BIGINT)
             |    AS largest_cluster)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |cents AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
         |    embedding AS cent
         |  FROM embeddings ORDER BY vec_id
         |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
         |e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |asg AS (
         |  SELECT e2.vec_id AS id, c.cent_id AS bucket,
         |    row_number() OVER (PARTITION BY e2.vec_id
         |      ORDER BY list_cosine_similarity(e2.embedding, c.cent) DESC,
         |        c.cent_id) AS r
         |  FROM embeddings e2, cents c),
         |qq AS MATERIALIZED (
         |  SELECT a.id, a.bucket, q.v
         |  FROM (SELECT id, bucket FROM asg WHERE r = 1) a
         |  JOIN q ON q.vec_id = a.id),
         |pr AS MATERIALIZED (
         |  SELECT a.id AS ia, bb.id AS ib,
         |    CAST(SUM((a.v[i + 1] - bb.v[i + 1]) * (a.v[i + 1] - bb.v[i + 1]))
         |      AS BIGINT) AS d
         |  FROM qq a JOIN qq bb ON a.bucket = bb.bucket AND a.id < bb.id,
         |    range(64) r(i)
         |  GROUP BY 1, 2),
         |ori AS (SELECT ia AS id, ib AS other, d FROM pr
         |        UNION ALL SELECT ib, ia, d FROM pr),
         |core AS MATERIALIZED (
         |  SELECT id, d AS core FROM (
         |    SELECT id, other, d,
         |      row_number() OVER (PARTITION BY id ORDER BY d, other) AS rn
         |    FROM ori) z WHERE rn = 4),
         |wt AS MATERIALIZED (
         |  SELECT p.ia, p.ib,
         |    GREATEST(p.d, COALESCE(ca.core, 1000000000),
         |      COALESCE(cb.core, 1000000000)) AS w
         |  FROM pr p LEFT JOIN core ca ON ca.id = p.ia
         |  LEFT JOIN core cb ON cb.id = p.ib),
         |tq AS (SELECT quantile_cont(CAST(w AS DOUBLE), 0.25) AS t25,
         |         quantile_cont(CAST(w AS DOUBLE), 0.5) AS t50,
         |         quantile_cont(CAST(w AS DOUBLE), 0.75) AS t75
         |       FROM wt),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
         |$blocks
         |SELECT * FROM st25 UNION ALL SELECT * FROM st50
         |UNION ALL SELECT * FROM st75
         |ORDER BY prob""".stripMargin
    },
    // per-treated argmin by correlated subquery — ABS-nearest within the
    // 1024-cent band, ties backward then max user (the asof dedupe rule);
    // disjoint formulation of the same match
    "q221_matching_att" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS pre,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS post
        |  FROM ev, p GROUP BY 1),
        |tr AS (SELECT * FROM pu WHERE user_id % 2 = 1),
        |ct AS MATERIALIZED (SELECT * FROM pu WHERE user_id % 2 = 0),
        |mt AS (
        |  SELECT t.user_id, t.pre, t.post,
        |    (SELECT c.user_id FROM ct c
        |     WHERE c.pre // 1024 = t.pre // 1024
        |     ORDER BY ABS(c.pre - t.pre),
        |       CASE WHEN c.pre <= t.pre THEN 0 ELSE 1 END,
        |       c.user_id DESC
        |     LIMIT 1) AS cu
        |  FROM tr t),
        |j AS (SELECT m.user_id, m.pre, m.post, m.cu, c.pre AS cp, c.post AS co
        |      FROM mt m LEFT JOIN ct c ON c.user_id = m.cu)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
        |  CAST(COUNT(cu) AS BIGINT) AS n_matched,
        |  CAST(SUM(CASE WHEN cu IS NOT NULL THEN post - co END) AS DOUBLE)
        |    / CAST(COUNT(cu) AS DOUBLE) AS att_cents,
        |  CAST(SUM(CASE WHEN cu IS NOT NULL THEN pre - cp END) AS DOUBLE)
        |    / CAST(COUNT(cu) AS DOUBLE) AS mean_pre_gap
        |FROM j""".stripMargin,
    "q18_minhash_pairs" -> minhashOracleSql,
    // q18's candidate pair set labeled by source on both sides, rolled to
    // the source-pair grain (canonical least/greatest orientation)
    "q136_dup_matrix" -> {
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |lab AS (SELECT doc_id, source FROM documents),
         |m AS (
         |  SELECT least(sa.source, sb.source) AS source_a,
         |    greatest(sa.source, sb.source) AS source_b
         |  FROM prs
         |  JOIN lab sa ON sa.doc_id = prs.id_a
         |  JOIN lab sb ON sb.doc_id = prs.id_b)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  (source_a <> source_b) AS cross_source
         |FROM m GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin
    },
    // τ=0.5 temperature mix: isqrt replayed as corrected floor(sqrt);
    // every division a floor, same order as Mixing.ratesPpm
    "q137_temperature_mix" -> {
      val md5 = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |tot AS (SELECT source, CAST(SUM(t) AS BIGINT) AS st FROM d GROUP BY 1),
         |s0 AS (SELECT source, st,
         |        CAST(floor(sqrt(CAST(st AS DOUBLE))) AS BIGINT) AS s
         |       FROM tot),
         |sq AS (SELECT source, st,
         |        CASE WHEN (s + 1) * (s + 1) <= st THEN s + 1
         |             WHEN s * s > st THEN s - 1 ELSE s END AS w
         |       FROM s0),
         |g AS (SELECT CAST(SUM(st) // 2 AS BIGINT) AS budget,
         |        CAST(greatest(SUM(w), 1) AS BIGINT) AS wsum FROM sq),
         |r AS (SELECT source, st,
         |        CAST(w * 1000000 // g.wsum AS BIGINT) AS weight_ppm
         |      FROM sq, g),
         |r2 AS (SELECT source, weight_ppm,
         |        CAST(LEAST(1000000, ((g.budget * weight_ppm // 1000000) * 1000000)
         |          // greatest(st, 1)) AS BIGINT) AS rate_ppm
         |       FROM r, g),
         |kept AS (
         |  SELECT d.source, r2.weight_ppm, r2.rate_ppm, d.t
         |  FROM d JOIN r2 USING (source)
         |  WHERE ($md5 % 1000000) < r2.rate_ppm)
         |SELECT source, weight_ppm, rate_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY 1, 2, 3 ORDER BY source""".stripMargin
    },
    // int8-quantized exact-integer cosine threshold (θ² = 9/100): the
    // whole predicate is BIGINT, so the flag set replays bit-for-bit
    "q138_semantic_decon" -> {
      def dotSql(a: String, b: String) =
        (1 to 64).map(i => s"$a[$i]*$b[$i]").mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x))) AS ma
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id,
         |    CASE WHEN ma > 0 THEN list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
         |           AS BIGINT))
         |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
         |  FROM e),
         |n2 AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nn FROM q),
         |p AS (
         |  SELECT c.vec_id AS cid, t.vec_id AS tid,
         |    ${dotSql("c.v", "t.v")} AS d, c.nn AS na, t.nn AS nb
         |  FROM n2 c JOIN n2 t ON c.vec_id >= 15 AND t.vec_id < 15)
         |SELECT cid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_test_matches,
         |  CAST(MIN(tid) AS BIGINT) AS first_test_id
         |FROM p WHERE d > 0 AND d * d * 100 >= 9 * na * nb
         |GROUP BY 1 ORDER BY vec_id""".stripMargin
    },
    // two unrolled synchronous majority rounds over the q131 mutual-kNN
    // edges; winner = max count, ties to the smaller label; seeds clamped
    "q139_label_prop" ->
      s"""WITH $ivfMutualSqlCte,
        |und AS (
        |  SELECT id_a AS src, id_b AS dst FROM mut
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
        |n0 AS (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 4 = 0 THEN CAST(label AS BIGINT) END AS lab
        |  FROM embeddings),
        |v1 AS (
        |  SELECT dst, lab FROM (
        |    SELECT u.dst, s.lab,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY COUNT(*) DESC, s.lab ASC) AS rn
        |    FROM und u JOIN n0 s ON s.vec_id = u.src AND s.lab IS NOT NULL
        |    GROUP BY u.dst, s.lab) WHERE rn = 1),
        |l1 AS (
        |  SELECT n.vec_id, COALESCE(n.lab, v.lab) AS lab,
        |    CASE WHEN n.lab IS NOT NULL THEN 0
        |         WHEN v.lab IS NOT NULL THEN 1 END AS rnd
        |  FROM n0 n LEFT JOIN v1 v ON v.dst = n.vec_id),
        |v2 AS (
        |  SELECT dst, lab FROM (
        |    SELECT u.dst, s.lab,
        |      row_number() OVER (PARTITION BY u.dst
        |        ORDER BY COUNT(*) DESC, s.lab ASC) AS rn
        |    FROM und u JOIN l1 s ON s.vec_id = u.src AND s.lab IS NOT NULL
        |    GROUP BY u.dst, s.lab) WHERE rn = 1),
        |l2 AS (
        |  SELECT n.vec_id, COALESCE(n.lab, v.lab) AS lab,
        |    COALESCE(n.rnd, CASE WHEN v.lab IS NOT NULL THEN 2 END) AS rnd
        |  FROM l1 n LEFT JOIN v2 v ON v.dst = n.vec_id)
        |SELECT vec_id, lab AS label, CAST(rnd AS BIGINT) AS round_assigned
        |FROM l2 ORDER BY vec_id""".stripMargin,
    // global-decile TV distance in integer ppm; NTILE tie-break (value,
    // doc_id) is groupedNtile's exact contract (the q77 parity)
    "q140_tv_drift" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS v
        |  FROM documents),
        |b AS (
        |  SELECT source,
        |    CAST(NTILE(10) OVER (ORDER BY v, doc_id) AS BIGINT) AS bin
        |  FROM d),
        |cells AS (
        |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, bb.bin
        |  FROM (SELECT DISTINCT source FROM cells) s,
        |       (SELECT DISTINCT bin FROM cells) bb),
        |dense AS (
        |  SELECT g.source, g.bin, COALESCE(c.n, 0) AS n
        |  FROM grid g LEFT JOIN cells c
        |    ON c.source = g.source AND c.bin = g.bin),
        |st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS stn FROM dense GROUP BY 1),
        |bt AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS btn FROM dense GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM dense)
        |SELECT d.source, CAST(MAX(st.stn) AS BIGINT) AS n_docs,
        |  CAST(SUM(ABS((d.n * 1000000 // st.stn)
        |    - (bt.btn * 1000000 // tt.tot))) // 2 AS BIGINT) AS tv_ppm
        |FROM dense d
        |JOIN st ON st.source = d.source
        |JOIN bt ON bt.bin = d.bin, tt
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // q47's recursive reachability components rolled up to token mass per
    // source; keeper rule = component == doc id (min label)
    "q142_dedup_roi" ->
      s"""WITH RECURSIVE $minhashPipelineCte,
         |mpairs AS (
         |  SELECT DISTINCT a.id AS ia, b.id AS ib
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |edges AS (SELECT ia AS a, ib AS b FROM mpairs UNION SELECT ib, ia FROM mpairs),
         |walk(id, lbl) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id),
         |comp AS (SELECT id, MIN(lbl) AS component FROM walk GROUP BY id),
         |tok AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |lab AS (
         |  SELECT tok.source, tok.t,
         |    (COALESCE(comp.component, tok.doc_id) <> tok.doc_id) AS dup
         |  FROM tok LEFT JOIN comp ON comp.id = tok.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN dup THEN t ELSE 0 END) AS BIGINT) AS dup_tokens,
         |  CAST(SUM(CASE WHEN dup THEN t ELSE 0 END) * 1000000
         |    // greatest(SUM(t), 1) AS BIGINT) AS savings_ppm
         |FROM lab GROUP BY 1 ORDER BY source""".stripMargin,
    // ceil divisions in pure integer arithmetic, floor ppm overhead
    "q143_packing_efficiency" ->
      """WITH tok AS (
        |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS t
        |  FROM documents),
        |x AS (SELECT t, CAST(ctx AS BIGINT) AS ctx
        |      FROM tok, (VALUES (128), (512), (2048)) AS c(ctx))
        |SELECT ctx, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS n_tokens,
        |  CAST(SUM((t + ctx - 1) // ctx) AS BIGINT) AS n_seqs,
        |  CAST(SUM(((t + ctx - 1) // ctx) * ctx) AS BIGINT) AS padded_tokens,
        |  CAST(((SUM(((t + ctx - 1) // ctx) * ctx) - SUM(t)) * 1000000)
        |    // greatest(SUM(((t + ctx - 1) // ctx) * ctx), 1) AS BIGINT)
        |    AS overhead_ppm,
        |  CAST((SUM(t) + ctx - 1) // ctx AS BIGINT) AS ideal_seqs
        |FROM x GROUP BY ctx ORDER BY ctx""".stripMargin,
    // bounded top-10 tie-broken by key; 1-row folds, floor ppm shares
    "q144_skew_audit" ->
      """WITH c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t10 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM
        |  (SELECT cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)),
        |a AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(cnt) AS BIGINT) AS mx
        |  FROM c)
        |SELECT n AS n_rows, k AS n_keys, mx AS max_cnt,
        |  CAST((mx * 1000000) // n AS BIGINT) AS max_share_ppm,
        |  CAST((t * 1000000) // n AS BIGINT) AS top10_mass_ppm,
        |  CAST(n // k AS BIGINT) AS mean_cnt
        |FROM a, t10""".stripMargin,
    // (group, token) grain then group grain; HUGEINT ppm mirrors the
    // Spark side's decimal(38,0) — both exact integer floor divisions
    "q145_simpson" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(c * (c - 1)) AS BIGINT) AS repeat_pairs,
        |  CAST((CAST(SUM(c * (c - 1)) AS HUGEINT) * 1000000)
        |    // greatest(CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1), 1) AS BIGINT)
        |    AS simpson_ppm
        |FROM tc GROUP BY 1 ORDER BY source""".stripMargin,
    // both rank chains replayed (q16 exact + q48 quantized), overlaps per
    // prefix depth, RBO in exact scaled integers (S = 960, max = 930)
    "q146_rbo" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(q.embedding, c.embedding) AS cos
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ta AS (SELECT qid, nid, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM pairs) WHERE rank <= 5),
        |e2 AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id,
        |    CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS DOUBLE))
        |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
        |  FROM e2),
        |qp AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      AS cos
        |  FROM qv a JOIN qv b ON a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |tb AS (SELECT qid, nid, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM qp) WHERE rank <= 5),
        |j AS (SELECT ta.qid, ta.rank AS ra, tb.rank AS rb
        |      FROM ta JOIN tb ON ta.qid = tb.qid AND ta.nid = tb.nid),
        |ag AS (SELECT qid,
        |  CAST(SUM(CASE WHEN ra <= 1 AND rb <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS ov1,
        |  CAST(SUM(CASE WHEN ra <= 2 AND rb <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ov2,
        |  CAST(SUM(CASE WHEN ra <= 3 AND rb <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS ov3,
        |  CAST(SUM(CASE WHEN ra <= 4 AND rb <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS ov4,
        |  CAST(SUM(CASE WHEN ra <= 5 AND rb <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS ov5
        |  FROM j GROUP BY 1)
        |SELECT qs.qid AS query_id,
        |  COALESCE(ov1, 0) AS ov1, COALESCE(ov2, 0) AS ov2,
        |  COALESCE(ov3, 0) AS ov3, COALESCE(ov4, 0) AS ov4,
        |  COALESCE(ov5, 0) AS ov5,
        |  480 * COALESCE(ov1, 0) + 120 * COALESCE(ov2, 0)
        |    + 40 * COALESCE(ov3, 0) + 15 * COALESCE(ov4, 0)
        |    + 6 * COALESCE(ov5, 0) AS rbo_scaled,
        |  CAST(930 AS BIGINT) AS rbo_max
        |FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 10) qs
        |LEFT JOIN ag ON ag.qid = qs.qid ORDER BY query_id""".stripMargin,
    // mod vs rendezvous migration under 8 -> 9; rendezvous argmax replayed
    // as a rank-1 window (hash DESC, shard ASC — the max-struct tie-break)
    "q147_shard_stability" -> {
      val md5id = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      val md5cat = graft.functions.PortableHash.md5Hash60Sql(
        "CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.s AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id FROM documents),
         |h AS (SELECT doc_id, $md5id AS hh FROM d),
         |rv8 AS (SELECT doc_id, s FROM (
         |  SELECT d.doc_id, u.s,
         |    row_number() OVER (PARTITION BY d.doc_id
         |      ORDER BY $md5cat DESC, u.s ASC) AS rn
         |  FROM d, unnest(generate_series(0, 7)) AS u(s)) WHERE rn = 1),
         |rv9 AS (SELECT doc_id, s FROM (
         |  SELECT d.doc_id, u.s,
         |    row_number() OVER (PARTITION BY d.doc_id
         |      ORDER BY $md5cat DESC, u.s ASC) AS rn
         |  FROM d, unnest(generate_series(0, 8)) AS u(s)) WHERE rn = 1),
         |m AS (
         |  SELECT h.doc_id,
         |    (h.hh % 8 <> h.hh % 9) AS mod_moved,
         |    (a8.s <> a9.s) AS rv_moved
         |  FROM h JOIN rv8 a8 USING (doc_id) JOIN rv9 a9 USING (doc_id)),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT) AS m1,
         |  CAST(SUM(CASE WHEN rv_moved THEN 1 ELSE 0 END) AS BIGINT) AS m2
         |  FROM m)
         |SELECT 'mod' AS strategy, n AS n_docs, m1 AS n_moved,
         |  CAST((m1 * 1000000) // greatest(n, 1) AS BIGINT) AS moved_ppm FROM a
         |UNION ALL
         |SELECT 'rendezvous', n, m2,
         |  CAST((m2 * 1000000) // greatest(n, 1) AS BIGINT) FROM a
         |ORDER BY strategy""".stripMargin
    },
    // daily exact top-20 (count desc, key asc), survivors on >= 3 days
    "q148_persistent_hitters" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) * 1000 AS tns, user_id FROM events),
        |c AS (SELECT tns // 86400000000000 AS day, user_id,
        |        CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT day, user_id, cnt,
        |        row_number() OVER (PARTITION BY day
        |          ORDER BY cnt DESC, user_id ASC) AS rk
        |      FROM c)
        |SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_epochs_top,
        |  CAST(MIN(rk) AS BIGINT) AS best_rank,
        |  CAST(MAX(cnt) AS BIGINT) AS max_cnt
        |FROM r WHERE rk <= 20 GROUP BY 1 HAVING COUNT(*) >= 3
        |ORDER BY key""".stripMargin,
    // (source, token) distinct grain self-joined on token; union by
    // inclusion-exclusion, floor ppm
    "q149_source_jaccard" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |st AS (SELECT DISTINCT source, tok FROM toks),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1),
        |i AS (SELECT a.source AS sa, b.source AS sb,
        |        CAST(COUNT(*) AS BIGINT) AS ni
        |      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b, ni AS n_inter,
        |  (za.n + zb.n - ni) AS n_union,
        |  CAST((ni * 1000000) // (za.n + zb.n - ni) AS BIGINT) AS jaccard_ppm
        |FROM i JOIN sz za ON za.source = i.sa JOIN sz zb ON zb.source = i.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // closed-form Gini on the distinct-value grain (run of c equal values
    // v after cumulative a contributes v*(c*a + c(c+1)/2) to sum i*x_i);
    // HUGEINT mirrors the Spark side's decimal(38,0)
    "q150_length_gini" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2),
        |r AS (SELECT source, v, c,
        |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |          AS BIGINT) AS a
        |      FROM g),
        |s1 AS (SELECT source,
        |        CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(v * c) AS BIGINT) AS total,
        |        SUM(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * a
        |          + (CAST(c AS HUGEINT) * (c + 1)) // 2)) AS S1
        |      FROM r GROUP BY 1)
        |SELECT source, n, total,
        |  CAST(CASE WHEN n * total > 0 THEN
        |    ((2 * S1 - CAST(n + 1 AS HUGEINT) * total) * 1000000)
        |      // (CAST(n AS HUGEINT) * total) END AS BIGINT) AS gini_ppm
        |FROM s1 ORDER BY source""".stripMargin,
    // rightmost-min winnowing selection via the hash*1e9 + (1e9-1-pos)
    // encoding; per-source gram mass from the doc lists, floor-ppm density
    "q151_winnow_density" ->
      s"""WITH $winnowSelCte,
         |fp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM sel GROUP BY 1),
         |gm AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(greatest(len(t) - 3, 0)) AS BIGINT) AS n_grams
         |       FROM d GROUP BY 1),
         |fs AS (SELECT d.source, CAST(SUM(fp.nf) AS BIGINT) AS nf
         |       FROM d JOIN fp USING (doc_id) GROUP BY 1)
         |SELECT gm.source, n_docs, n_grams,
         |  CAST(COALESCE(fs.nf, 0) AS BIGINT) AS n_fp,
         |  CASE WHEN n_grams > 0 THEN
         |    CAST((COALESCE(fs.nf, 0) * 1000000) // n_grams AS BIGINT)
         |  END AS density_ppm
         |FROM gm LEFT JOIN fs ON fs.source = gm.source
         |ORDER BY gm.source""".stripMargin,
    // distinct (doc, hash) grain; hash recovered as mc // 1e9; the df <=
    // 1000 gate replays the operator's maxBucket flood cap
    "q152_winnow_pairs" ->
      s"""WITH $winnowSelCte,
         |fps AS (SELECT DISTINCT doc_id,
         |          CAST(mc // 1000000000 AS BIGINT) AS h FROM sel),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM fps GROUP BY 1),
         |cap AS (SELECT doc_id, h FROM (
         |          SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM fps)
         |        WHERE df <= 1000),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared
         |       FROM cap a JOIN cap b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         |SELECT doc_a, doc_b, n_shared,
         |  CAST((n_shared * 1000000) // least(za.n, zb.n) AS BIGINT)
         |    AS containment_ppm
         |FROM pr JOIN sz za ON za.doc_id = pr.doc_a
         |        JOIN sz zb ON zb.doc_id = pr.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    // 2x2 confusion per source; kappa numerator can be NEGATIVE, so the
    // floor division is emulated via the pmod identity (DuckDB //
    // truncates toward zero); pe and n*n in HUGEINT
    "q153_gate_kappa" ->
      s"""WITH gop AS (SELECT doc_id, pass FROM ($gopherRulesSql)),
         |cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |j AS (SELECT dd.source, g.pass AS a, c.keep AS b
         |      FROM documents dd JOIN gop g USING (doc_id)
         |           JOIN cur c USING (doc_id)),
         |cf AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nao,
         |         CAST(SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nbo,
         |         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nn
         |       FROM j GROUP BY 1),
         |k AS (SELECT source, n, nb, nao, nbo, nn,
         |        (CAST(nb + nao AS HUGEINT) * (nb + nbo)
         |          + CAST(nbo + nn AS HUGEINT) * (nao + nn)) AS pe,
         |        (CAST(n AS HUGEINT) * (nb + nn)) AS agree_n
         |      FROM cf)
         |SELECT source, n, nb AS n_both, nao AS n_a_only, nbo AS n_b_only,
         |  nn AS n_neither,
         |  CAST(((nb + nn) * 1000000) // n AS BIGINT) AS po_ppm,
         |  CASE WHEN CAST(n AS HUGEINT) * n - pe <> 0 THEN CAST(
         |    ((agree_n - pe) * 1000000
         |      - ((((agree_n - pe) * 1000000) % (CAST(n AS HUGEINT) * n - pe)
         |          + (CAST(n AS HUGEINT) * n - pe))
         |         % (CAST(n AS HUGEINT) * n - pe)))
         |      // (CAST(n AS HUGEINT) * n - pe) AS BIGINT)
         |  END AS kappa_ppm
         |FROM k ORDER BY source""".stripMargin,
    // midrank rank-sum on the (source, n_chars) distinct grain; u2 =
    // 2*U1 >= 0 so plain // is already floor
    "q154_length_auc" ->
      s"""WITH cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |dj AS (SELECT dd.source, dd.n_chars AS v, c.keep
         |       FROM documents dd JOIN cur c USING (doc_id)),
         |g AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c,
         |        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS c1
         |      FROM dj GROUP BY 1, 2),
         |r AS (SELECT source, v, c, c1,
         |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
         |          AS BIGINT) AS a
         |      FROM g),
         |s AS (SELECT source, CAST(SUM(c1) AS BIGINT) AS n_pos,
         |        CAST(SUM(c - c1) AS BIGINT) AS n_neg,
         |        SUM(CAST(c1 AS HUGEINT) * (2 * a + c + 1)) AS r2
         |      FROM r GROUP BY 1)
         |SELECT source, n_pos, n_neg,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    CAST(((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
         |      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
         |  END AS auc_ppm
         |FROM s ORDER BY source""".stripMargin,
    // dense (pooled-value x source) grid; sup of the cross-multiplied CDF
    // gap, numerator in HUGEINT; floor-ppm on the max
    "q155_ks_drift" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |kv AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM d GROUP BY 1, 2),
        |p AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cp FROM kv GROUP BY 1),
        |ks AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM kv GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS np FROM p),
        |grid AS (SELECT k.source, p.v, p.cp, COALESCE(kv.c, 0) AS cs, k.ns
        |         FROM p CROSS JOIN ks k
        |         LEFT JOIN kv ON kv.source = k.source AND kv.v = p.v),
        |cums AS (SELECT source, ns,
        |           SUM(cs) OVER (PARTITION BY source ORDER BY v
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums,
        |           SUM(cp) OVER (PARTITION BY source ORDER BY v
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
        |         FROM grid),
        |mx AS (SELECT source, CAST(MIN(ns) AS BIGINT) AS n,
        |         MAX(abs(CAST(cums AS HUGEINT) * (SELECT np FROM tot)
        |           - CAST(cump AS HUGEINT) * ns)) AS mn
        |       FROM cums GROUP BY 1)
        |SELECT source, n,
        |  CAST((mn * 1000000)
        |    // (CAST(n AS HUGEINT) * (SELECT np FROM tot)) AS BIGINT) AS ks_ppm
        |FROM mx ORDER BY source""".stripMargin,
    // doubled midranks from the (key, value) grain joined back to rows;
    // HUGEINT co-moment sums cast to double, then q103's fixed IEEE tail
    "q156_spearman" ->
      """WITH c AS (
        |  SELECT l_returnflag AS k,
        |    CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS y
        |  FROM lineitem),
        |gx AS (SELECT k, x, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1, 2),
        |rx AS (SELECT k, x,
        |         2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |           AS BIGINT) + c + 1 AS r
        |       FROM gx),
        |gy AS (SELECT k, y, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1, 2),
        |ry AS (SELECT k, y,
        |         2 * CAST(COALESCE(SUM(c) OVER (PARTITION BY k ORDER BY y
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |           AS BIGINT) + c + 1 AS r
        |       FROM gy),
        |j AS (SELECT c.k, rx.r AS a, ry.r AS b
        |      FROM c JOIN rx ON rx.k = c.k AND rx.x = c.x
        |             JOIN ry ON ry.k = c.k AND ry.y = c.y),
        |s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(CAST(a AS HUGEINT)) AS DOUBLE) AS sx,
        |        CAST(SUM(CAST(b AS HUGEINT)) AS DOUBLE) AS sy,
        |        CAST(SUM(CAST(a AS HUGEINT) * a) AS DOUBLE) AS sxx,
        |        CAST(SUM(CAST(b AS HUGEINT) * b) AS DOUBLE) AS syy,
        |        CAST(SUM(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sxy
        |      FROM j GROUP BY 1)
        |SELECT k AS l_returnflag, n,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    (n * sxy - sx * sy)
        |      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |  END AS rho
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // fixed floor-ppm Benford literals; dense 9-digit grid per key so
    // absent digits report share 0
    "q157_benford" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(floor(o_totalprice) AS BIGINT) AS fv
        |  FROM orders WHERE floor(o_totalprice) >= 1),
        |d AS (SELECT pri,
        |        CAST(substring(CAST(fv AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |      FROM v),
        |c AS (SELECT pri, digit, CAST(COUNT(*) AS BIGINT) AS n_d
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |bf AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
        |         (4, 96910), (5, 79181), (6, 66946), (7, 57991),
        |         (8, 51152), (9, 45757)) AS t(digit, benford_ppm))
        |SELECT tot.pri, CAST(bf.digit AS BIGINT) AS digit,
        |  CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d,
        |  CAST((COALESCE(c.n_d, 0) * 1000000) // tot.n AS BIGINT) AS share_ppm,
        |  CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs((COALESCE(c.n_d, 0) * 1000000) // tot.n - bf.benford_ppm)
        |    AS BIGINT) AS dev_ppm
        |FROM tot CROSS JOIN bf
        |LEFT JOIN c ON c.pri = tot.pri AND c.digit = bf.digit
        |ORDER BY tot.pri, bf.digit""".stripMargin,
    // closed [s,e] intervals -> +1 at s, -1 at e+1; the oracle affords the
    // global ordered cumulative the engine decomposes into two levels
    "q158_max_concurrency" ->
      s"""WITH sess AS (
         |  SELECT session_start_us AS s, session_end_us AS e
         |  FROM ($sessionOracleSql)),
         |d AS (SELECT s AS t, 1 AS net FROM sess
         |      UNION ALL SELECT e + 1, -1 FROM sess),
         |tg AS (SELECT t, CAST(SUM(net) AS BIGINT) AS net FROM d GROUP BY 1),
         |c AS (SELECT t, net,
         |        SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM tg)
         |SELECT t // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n_changes,
         |  CAST(MAX(cum) AS BIGINT) AS max_concurrency
         |FROM c GROUP BY 1 ORDER BY day""".stripMargin,
    // the salted join's contract IS the plain join: same rows, same agg
    "q159_salted_join" ->
      """SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    // generated 16-step rotation CTE chain mirrors withHilbert2 column
    // for column; Morton from the shared zValue2Sql generator
    "q160_hilbert_locality" -> {
      val zsql = graft.operators.Layout.zValue2Sql("cx", "cy", 16)
      val hctes = graft.operators.Layout.hilbert2SqlCtes("hin", 16, Seq("cx", "cy"))
      s"""WITH cells AS (
         |  SELECT DISTINCT l_suppkey % 65536 AS cx, l_partkey % 65536 AS cy
         |  FROM lineitem),
         |hin AS (SELECT cx, cy, cx AS hx, cy AS hy FROM cells),
         |$hctes,
         |hz AS (SELECT 'hilbert' AS strategy, cx, cy, hd AS idx FROM hil16
         |       UNION ALL
         |       SELECT 'zorder', cx, cy, $zsql FROM cells),
         |lg AS (SELECT strategy, cx, cy,
         |         LAG(cx) OVER (PARTITION BY strategy, idx >> 14
         |           ORDER BY idx) AS px,
         |         LAG(cy) OVER (PARTITION BY strategy, idx >> 14
         |           ORDER BY idx) AS py
         |       FROM hz)
         |SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_cells,
         |  CAST(SUM(CASE WHEN px IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_steps,
         |  CAST(SUM(CASE WHEN px IS NULL THEN 0
         |            ELSE abs(cx - px) + abs(cy - py) END) AS BIGINT)
         |    AS total_jump
         |FROM lg GROUP BY 1 ORDER BY strategy""".stripMargin
    },
    // the pipeline CTE's sh table IS the shingle grain; pairs from the
    // q18/q136 band derivation; exact Jaccard by (id_b, shingle) join
    "q162_lsh_precision" ->
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |shd AS (SELECT DISTINCT id, s FROM sh),
         |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY 1),
         |i AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
         |      FROM prs p JOIN shd a ON a.id = p.id_a
         |                 JOIN shd b ON b.id = p.id_b AND b.s = a.s
         |      GROUP BY 1, 2)
         |SELECT p.id_a, p.id_b,
         |  CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
         |  CAST(za.n + zb.n - COALESCE(i.ni, 0) AS BIGINT) AS n_union,
         |  CAST((COALESCE(i.ni, 0) * 1000000)
         |    // (za.n + zb.n - COALESCE(i.ni, 0)) AS BIGINT) AS jaccard_ppm,
         |  ((COALESCE(i.ni, 0) * 1000000)
         |    // (za.n + zb.n - COALESCE(i.ni, 0))) >= 500000 AS verified
         |FROM prs p LEFT JOIN i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |JOIN sz za ON za.id = p.id_a JOIN sz zb ON zb.id = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    // q47's recursive components + token mass; keeper = rank-1 by
    // (n_tok desc, id asc) — the max-struct tie-break
    "q163_quality_keeper" ->
      s"""WITH comp AS ($dedupGroupsOracleSql),
         |tk AS (SELECT doc_id AS id,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |           AS n_tok
         |       FROM documents),
         |j AS (SELECT c.component, c.id, t.n_tok
         |      FROM comp c JOIN tk t USING (id)),
         |r AS (SELECT component, id, n_tok,
         |        row_number() OVER (PARTITION BY component
         |          ORDER BY n_tok DESC, id ASC) AS rk
         |      FROM j)
         |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MIN(CASE WHEN rk = 1 THEN id END) AS BIGINT) AS keeper_doc,
         |  CAST(MIN(CASE WHEN rk = 1 THEN n_tok END) AS BIGINT) AS keeper_toks,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_toks,
         |  CAST(SUM(n_tok) - MIN(CASE WHEN rk = 1 THEN n_tok END) AS BIGINT)
         |    AS saved_toks
         |FROM r GROUP BY component ORDER BY component""".stripMargin,
    // q47's recursive components (singletons self-labeled) + survivorship:
    // mode via two-level count + (count desc, value asc) rank — the same
    // deterministic tie GoldenRecord.modePerCluster pins
    "q174_golden_record" ->
      s"""WITH comp AS ($dedupGroupsOracleSql),
         |lab AS (
         |  SELECT d.doc_id, d.source, d.lang, d.n_chars,
         |    coalesce(c.component, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |base AS (
         |  SELECT cluster, CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_members,
         |    CAST(MAX(n_chars) AS BIGINT) AS n_chars_max
         |  FROM lab GROUP BY 1),
         |sc AS (SELECT cluster, source, count(*) AS c FROM lab GROUP BY 1, 2),
         |sm AS (SELECT cluster, source AS source_gold FROM (
         |         SELECT cluster, source,
         |           row_number() OVER (PARTITION BY cluster
         |             ORDER BY c DESC, source ASC) AS r
         |         FROM sc) t WHERE r = 1),
         |lc AS (SELECT cluster, lang, count(*) AS c FROM lab GROUP BY 1, 2),
         |lm AS (SELECT cluster, lang AS lang_gold FROM (
         |         SELECT cluster, lang,
         |           row_number() OVER (PARTITION BY cluster
         |             ORDER BY c DESC, lang ASC) AS r
         |         FROM lc) t WHERE r = 1)
         |SELECT base.cluster, base.canonical_id, base.n_members,
         |  base.n_chars_max, sm.source_gold, lm.lang_gold
         |FROM base JOIN sm USING (cluster) JOIN lm USING (cluster)
         |ORDER BY cluster""".stripMargin,
    // q101's basket shape at the part grain + degree join; cos^2 in
    // HUGEINT, total-ordered top-50
    "q166_item_cosine" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |f AS (SELECT i FROM bi GROUP BY i HAVING COUNT(*) >= 3),
        |bf AS (SELECT b, i FROM bi WHERE i IN (SELECT i FROM f)),
        |p AS (SELECT a.i AS item_a, b2.i AS item_b,
        |        CAST(COUNT(*) AS BIGINT) AS pair_count
        |      FROM bf a JOIN bf b2 ON a.b = b2.b AND a.i < b2.i
        |      GROUP BY 1, 2),
        |pp AS (SELECT * FROM p WHERE pair_count >= 3),
        |d AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS d FROM bi GROUP BY 1)
        |SELECT item_a, item_b, pair_count, da.d AS d_a, db.d AS d_b,
        |  CAST((CAST(pair_count AS HUGEINT) * pair_count * 1000000)
        |    // (CAST(da.d AS HUGEINT) * db.d) AS BIGINT) AS cos2_ppm
        |FROM pp JOIN d da ON da.i = pp.item_a JOIN d db ON db.i = pp.item_b
        |ORDER BY cos2_ppm DESC, item_a, item_b LIMIT 50""".stripMargin,
    // total-ordered (t, event_id) lag; one aggregate unpivoted to the
    // 4-horizon curve
    "q167_repurchase_curve" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |l AS (SELECT t - LAG(t) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id) AS gap FROM p),
        |g AS (SELECT gap FROM l WHERE gap IS NOT NULL),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN gap <= 86400000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c1,
        |  CAST(SUM(CASE WHEN gap <= 604800000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c7,
        |  CAST(SUM(CASE WHEN gap <= 1209600000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c14,
        |  CAST(SUM(CASE WHEN gap <= 2592000000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c30
        |  FROM g)
        |SELECT k_days, n AS n_gaps, c AS n_within,
        |  CAST((c * 1000000) // n AS BIGINT) AS within_ppm
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS k_days, n, c1 AS c FROM a
        |  UNION ALL SELECT 7, n, c7 FROM a
        |  UNION ALL SELECT 14, n, c14 FROM a
        |  UNION ALL SELECT 30, n, c30 FROM a)
        |ORDER BY k_days""".stripMargin,
    // full-join of the two value grains; same cross-multiplied sup as
    // q155, single comparison
    "q168_ks_two_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS v
        |  FROM documents),
        |ga AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS ca FROM d
        |       WHERE doc_id % 8 < 4 GROUP BY 1),
        |gb AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cb FROM d
        |       WHERE doc_id % 8 >= 4 GROUP BY 1),
        |g AS (SELECT COALESCE(ga.v, gb.v) AS v, COALESCE(ca, 0) AS ca,
        |        COALESCE(cb, 0) AS cb
        |      FROM ga FULL JOIN gb ON ga.v = gb.v),
        |c AS (SELECT v,
        |        SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
        |        SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
        |        SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
        |      FROM g)
        |SELECT CAST(MIN(na) AS BIGINT) AS n_a, CAST(MIN(nb) AS BIGINT) AS n_b,
        |  CAST((MAX(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
        |    * 1000000) // (CAST(MIN(na) AS HUGEINT) * MIN(nb)) AS BIGINT)
        |    AS ks_ppm
        |FROM c""".stripMargin,
    // sig CTE carries m0..m31; agreement = generated 32-term CASE sum;
    // exact side reuses q162's shingle-join shape; floor-mean per bin
    "q169_minhash_calibration" -> {
      val agree = (0 until 32)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashPipelineCte,
         |prs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM sized a JOIN sized b
         |    ON a.bno = b.bno AND a.bk = b.bk AND a.id < b.id
         |  WHERE a.bsz BETWEEN 2 AND 1000),
         |m AS (SELECT p.id_a, p.id_b, CAST($agree AS BIGINT) AS est_matches
         |      FROM prs p JOIN sig a ON a.id = p.id_a
         |                 JOIN sig b ON b.id = p.id_b),
         |shd AS (SELECT DISTINCT id, s FROM sh),
         |sz AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM shd GROUP BY 1),
         |i AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
         |      FROM prs p JOIN shd a ON a.id = p.id_a
         |                 JOIN shd b ON b.id = p.id_b AND b.s = a.s
         |      GROUP BY 1, 2),
         |jp AS (SELECT m.est_matches,
         |         (COALESCE(i.ni, 0) * 1000000)
         |           // (za.n + zb.n - COALESCE(i.ni, 0)) AS jppm
         |       FROM m LEFT JOIN i ON i.id_a = m.id_a AND i.id_b = m.id_b
         |       JOIN sz za ON za.id = m.id_a JOIN sz zb ON zb.id = m.id_b)
         |SELECT est_matches,
         |  CAST((est_matches * 1000000) // 32 AS BIGINT) AS est_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(jppm) // COUNT(*) AS BIGINT) AS avg_true_ppm
         |FROM jp GROUP BY 1 ORDER BY est_matches""".stripMargin
    },
    // global running-max lateness; the oracle affords the one-partition
    // window the engine decomposes into two levels
    "q170_lateness_audit" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS t FROM events),
        |r AS (SELECT event_id, t,
        |        MAX(t) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS rm
        |      FROM e)
        |SELECT event_id // 4096 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN rm - t > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(MAX(rm - t) AS BIGINT) AS max_lateness
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    // midranks on the (source, value) grain joined back to docs
    "q164_percentile_normalize" ->
      """WITH g AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, v, c,
        |        CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c, 0)
        |          AS BIGINT) AS a,
        |        CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
        |      FROM g),
        |p AS (SELECT source, v,
        |        CAST(((2 * a + c + 1) * 1000000) // (2 * n) AS BIGINT)
        |          AS pct_ppm
        |      FROM r)
        |SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
        |  p.pct_ppm
        |FROM documents d JOIN p ON p.source = d.source AND p.v = d.n_chars
        |ORDER BY d.doc_id""".stripMargin,
    // frequency-of-frequency grain; whole levels assigned by integer
    // cross-multiplied 50%/90% preceding-mass thresholds
    "q165_zipf_segments" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
        |ff AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS nt,
        |         CAST(c * COUNT(*) AS BIGINT) AS mass
        |       FROM tc GROUP BY 1),
        |r AS (SELECT c, nt, mass,
        |        CAST(COALESCE(SUM(mass) OVER (ORDER BY c DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS HUGEINT) AS prev,
        |        CAST(SUM(mass) OVER () AS HUGEINT) AS m
        |      FROM ff),
        |s AS (SELECT c, nt, mass, m,
        |        CASE WHEN 2 * prev < m THEN '1_head'
        |             WHEN 10 * prev < 9 * m THEN '2_middle'
        |             ELSE '3_tail' END AS segment
        |      FROM r)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_levels,
        |  CAST(SUM(nt) AS BIGINT) AS n_terms,
        |  CAST(SUM(mass) AS BIGINT) AS mass,
        |  CAST((CAST(SUM(mass) AS HUGEINT) * 1000000) // MAX(m) AS BIGINT)
        |    AS mass_ppm,
        |  CAST(MIN(c) AS BIGINT) AS min_freq,
        |  CAST(MAX(c) AS BIGINT) AS max_freq
        |FROM s GROUP BY 1 ORDER BY segment""".stripMargin,
    // constant-key ntile == plain NTILE over (value, id); keep flags from
    // the shared curation CTE
    "q161_gate_calibration" ->
      s"""WITH cur AS (SELECT doc_id, keep FROM ($curationGateSql)),
         |t AS (SELECT doc_id, source,
         |        CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
         |          AS decile
         |      FROM documents),
         |j AS (SELECT t.source, t.decile, cur.keep
         |      FROM t JOIN cur USING (doc_id))
         |SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST((SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
         |    AS BIGINT) AS keep_ppm
         |FROM j GROUP BY 1, 2 ORDER BY source, decile""".stripMargin,
    // first-appearance epoch per distinct 3-gram; novelty in floor ppm
    "q141_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id % 8 AS epoch,
        |    string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT epoch, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
        |  FROM d, unnest(generate_series(1, len(w) - 2)) AS u(i)
        |  WHERE len(w) >= 3),
        |f AS (SELECT gram, MIN(epoch) AS fe FROM g GROUP BY 1)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CASE WHEN epoch = fe THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST((SUM(CASE WHEN epoch = fe THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM g JOIN f USING (gram) GROUP BY 1 ORDER BY epoch""".stripMargin,
    // q90: greedy-earliest funnel — each step's min is strictly after the
    // prior step's; both engines compare in the shared epoch-µs domain
    // (DuckDB reads parquet TIMESTAMP(NANOS) at µs precision).
    // q96 folds the same funnel incrementally over a time-split — the
    // ordered-batch state update must reproduce the full recompute, so it
    // shares the oracle verbatim.
    "q90_funnel" -> funnelOracleSql,
    "q96_funnel_inc" -> funnelOracleSql,
    // q90's funnel as a CTE; 2x2 chi-square on exact HUGEINT products,
    // one double division (z^2 on proportions is the same statistic)
    "q199_funnel_ab" ->
      s"""WITH f AS ($funnelOracleSql),
         |cc AS (SELECT user_id % 2 AS arm,
         |         (steps_completed >= 3 AND t3_us - t1_us <= 86400000000) AS conv
         |       FROM f),
         |t AS (SELECT
         |  CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |  CAST(SUM(CASE WHEN arm = 0 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |  CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |  CAST(SUM(CASE WHEN arm = 1 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS d
         |  FROM cc),
         |r AS (SELECT a + b AS n_0, a AS conv_0, c + d AS n_1, c AS conv_1,
         |  CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS rate_0,
         |  CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS rate_1,
         |  CASE WHEN a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0 THEN
         |    CAST(CAST(a + b + c + d AS HUGEINT) *
         |      ((CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) *
         |       (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)) AS DOUBLE)
         |    / CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
         |        AS DOUBLE)
         |  ELSE 0.0 END AS chi2
         |  FROM t)
         |SELECT n_0, conv_0, n_1, conv_1, rate_0, rate_1, chi2,
         |  (chi2 > 3.841458820694124) AS significant FROM r""".stripMargin,
    // bounded shard grain; the rank window runs on 40 rows only
    "q200_makespan_balance" ->
      """WITH sh AS (
        |  SELECT doc_id % 40 AS shard,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |h AS (SELECT shard % 8 AS worker, SUM(w) AS load FROM sh GROUP BY 1),
        |s1 AS (SELECT 'hash' AS strategy, CAST(8 AS INTEGER) AS workers,
        |  CAST(MAX(load) AS BIGINT) AS makespan,
        |  CAST(SUM(load) AS BIGINT) AS total,
        |  CAST(MAX(load) AS DOUBLE) / (CAST(SUM(load) AS DOUBLE) / 8.0)
        |    AS imbalance
        |  FROM h),
        |r AS (SELECT w, shard,
        |        (row_number() OVER (ORDER BY w DESC, shard) - 1) % 8 AS worker
        |      FROM sh),
        |l AS (SELECT worker, SUM(w) AS load FROM r GROUP BY 1),
        |s2 AS (SELECT 'sorted_rr' AS strategy, CAST(8 AS INTEGER) AS workers,
        |  CAST(MAX(load) AS BIGINT) AS makespan,
        |  CAST(SUM(load) AS BIGINT) AS total,
        |  CAST(MAX(load) AS DOUBLE) / (CAST(SUM(load) AS DOUBLE) / 8.0)
        |    AS imbalance
        |  FROM l)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY strategy""".stripMargin,
    // q91: all-integer day/week grid (epoch_ns // ns-per-day), distinct
    // users per cell via the two-level aggregate
    "q91_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
        |g AS (
        |  SELECT f.d0 // 7 AS cohort_week, (e.d - f.d0) // 7 AS week_offset,
        |    e.user_id, COUNT(*) AS n
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2, 3)
        |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        |  CAST(week_offset AS BIGINT) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n) AS BIGINT) AS n_events
        |FROM g GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // q92: the two-pass MG output is exactly the items above n/(k+1)
    // (k=29), so the oracle is the plain exact threshold query
    "q92_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY tok)
        |SELECT c.tok, c.c, n.n_total FROM c, n
        |WHERE c.c * 30 > n.n_total
        |ORDER BY c.c DESC, c.tok""".stripMargin,
    // q94: lag ordered by (µs, event_id) — the engine-shared total order;
    // p is exact n / conditional-total division
    "q94_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,
    // q95: NTILE ties broken by user_id; monetary via the exact-cents
    // decimal-sum policy (q01 idiom)
    "q95_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(epoch_ns(ts) // 86400000000000) AS dmax,
        |    CAST(COUNT(*) AS BIGINT) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS m_dec
        |  FROM events GROUP BY user_id),
        |g AS (SELECT MAX(dmax) AS gmax FROM u),
        |t AS (
        |  SELECT u.user_id,
        |    CAST(g.gmax - u.dmax AS BIGINT) AS recency_days,
        |    u.frequency, u.m_dec,
        |    CAST(NTILE(4) OVER (ORDER BY g.gmax - u.dmax, u.user_id)
        |      AS BIGINT) AS r_tile,
        |    CAST(NTILE(4) OVER (ORDER BY u.frequency, u.user_id)
        |      AS BIGINT) AS f_tile,
        |    CAST(NTILE(4) OVER (ORDER BY u.m_dec, u.user_id)
        |      AS BIGINT) AS m_tile
        |  FROM u, g)
        |SELECT user_id, recency_days, frequency,
        |  CAST(m_dec AS DOUBLE) AS monetary, r_tile, f_tile, m_tile,
        |  CAST(r_tile AS VARCHAR) || '-' || CAST(f_tile AS VARCHAR) || '-' ||
        |    CAST(m_tile AS VARCHAR) AS segment
        |FROM t ORDER BY user_id""".stripMargin,
    // q93: vocab = top-20 en-slice terms by (count desc, term); coverage
    // is one exact-int / exact-int double division
    "q93_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |v AS (
        |  SELECT term FROM (
        |    SELECT term, COUNT(*) AS n FROM tk WHERE lang = 'en'
        |    GROUP BY term ORDER BY n DESC, term LIMIT 20)),
        |c AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) FILTER (WHERE term IN (SELECT term FROM v))
        |      AS BIGINT) AS in_vocab
        |  FROM tk GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, c.n_tokens, c.in_vocab,
        |  CAST(c.in_vocab AS DOUBLE) / c.n_tokens AS coverage,
        |  CAST(c.in_vocab AS DOUBLE) / c.n_tokens >= 0.65 AS pass
        |FROM documents d JOIN c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // distinct-signature grain: identical docs collapse BEFORE banding,
    // exactly what the probe (and the harvest) count
    "q86_minhash_stats" ->
      s"""WITH $minhashPipelineCte,
         |dsig AS (SELECT DISTINCT sig, bno, bk FROM banded),
         |occ AS (
         |  SELECT bno, bk, CAST(COUNT(*) AS BIGINT) AS occ
         |  FROM dsig GROUP BY 1, 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(occ) AS BIGINT) AS n_sig_band_rows,
         |  CAST(MAX(occ) AS BIGINT) AS max_occ,
         |  CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_buckets,
         |  CAST(SUM(occ * (occ - 1) / 2) AS BIGINT) AS pair_work
         |FROM occ""".stripMargin,
    "q19_simhash" ->
      s"""WITH $simhashSqlCte
         |SELECT id, simhash, simhash >> 45 AS bucket FROM sim ORDER BY id""".stripMargin,
    // brute-force Hamming join == the banded pairing by pigeonhole
    // completeness (<= 3 differing bits leave >= 1 of 4 blocks intact)
    "q43_simhash_pairs" ->
      s"""WITH $simhashSqlCte
         |SELECT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sim a JOIN sim b ON a.id < b.id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q33_embedding_neardup" -> embNearDupOracleSql,
    "q47_dedup_groups" -> dedupGroupsOracleSql,
    // q17's centroid/assignment replay + q33's exact-double cosine scoring
    // + q47's recursive reachability, composed: cluster-scoped pairs only.
    "q67_semantic_dedup" ->
      """WITH RECURSIVE cents AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id, embedding AS cent
        |  FROM embeddings ORDER BY vec_id
        |  LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)),
        |asg AS (
        |  SELECT e.vec_id AS id, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         c.cent_id AS bucket,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC, c.cent_id) AS r
        |  FROM embeddings e, cents c),
        |b AS (SELECT id, v, bucket FROM asg WHERE r = 1),
        |sized AS (SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bsz FROM b),
        |mp AS (
        |  SELECT a.id AS ia, bb.id AS ib
        |  FROM sized a JOIN sized bb ON a.bucket = bb.bucket AND a.id < bb.id
        |  WHERE a.bsz BETWEEN 2 AND 10000
        |    AND list_dot_product(a.v, bb.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(bb.v, bb.v)))
        |      >= CAST(0.42 AS DOUBLE)),
        |edges AS (SELECT ia AS a, ib AS b FROM mp UNION SELECT ib, ia FROM mp),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e2.b, w.lbl FROM walk w JOIN edges e2 ON e2.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT b.id, coalesce(comp.component, b.id) AS component,
        |  coalesce(comp.component, b.id) = b.id AS is_keeper
        |FROM b LEFT JOIN comp USING (id) ORDER BY id""".stripMargin,
    // the oracle groups on window STRINGS where Spark groups on their
    // md5Hash60 — identical grouping absent 60-bit collisions
    "q68_dup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |pd AS (SELECT s, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM win GROUP BY 1, 2),
        |nd AS (SELECT s, doc_id, c, COUNT(*) OVER (PARTITION BY s) AS ndocs FROM pd)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS dup_frac
        |FROM nd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same window-string grouping as q68; the island sum replays the
    // fixed-width interval union (new span when the start gap exceeds 8)
    // shared by q85 (hash-screen algorithm) and q116 (prefix-doubling
    // algorithm): both must equal the brute-force window formulation
    "q85_dup_span_ranges" -> dupSpanRangesOracle,
    "q116_sa_dup_ranges" -> dupSpanRangesOracle,
    // per-dim rank chains on prefix-sliced lists (q16's membership-margin
    // argument), full-list left join so zero-overlap probes still report
    "q122_trunc_recall" -> {
      val dimBlocks = Seq(8, 16, 32).map { d =>
        s"""SELECT f.query_id, $d AS dim,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_overlap,
           |  CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS DOUBLE) / 5 AS recall
           |FROM fullk f LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.qid
           |        ORDER BY list_cosine_similarity(q.qv[1:$d], c.embedding[1:$d])
           |          DESC, c.vec_id) AS r
           |    FROM q JOIN embeddings c ON c.vec_id <> q.qid) z WHERE r <= 5
           |) t ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
           |GROUP BY f.query_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |fullk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.qid
         |        ORDER BY list_cosine_similarity(q.qv, c.embedding) DESC,
         |          c.vec_id) AS r
         |    FROM q JOIN embeddings c ON c.vec_id <> q.qid) z WHERE r <= 5)
         |$dimBlocks
         |ORDER BY query_id, dim""".stripMargin
    },
    // bigram-grain left join against the even-slice count model; both
    // scores are exact-long / exact-long single divisions
    "q123_lm_familiarity" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS x, t[i+1] AS y
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |ref AS (
        |  SELECT x, y, COUNT(*) AS rc FROM bg WHERE doc_id % 2 = 0
        |  GROUP BY x, y HAVING COUNT(*) >= 2),
        |sc AS (
        |  SELECT bg.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(CASE WHEN ref.rc IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_matched,
        |    CAST(SUM(COALESCE(ref.rc, 0)) AS BIGINT) AS ref_mass
        |  FROM bg LEFT JOIN ref ON ref.x = bg.x AND ref.y = bg.y
        |  GROUP BY bg.doc_id)
        |SELECT doc_id, n_bigrams, n_matched, ref_mass,
        |  CAST(n_matched AS DOUBLE) / n_bigrams AS coverage,
        |  CAST(ref_mass AS DOUBLE) / n_bigrams AS familiarity
        |FROM sc ORDER BY doc_id""".stripMargin,
    // portable md5 bucket hash + fixed-point `//` ratio replays the Spark
    // `div` arithmetic bit-for-bit; rank ties broken by doc_id both sides
    "q124_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |    (('0x' || substring(md5(CAST(tok AS VARCHAR)), 2, 15))::BIGINT)
        |      % 256 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |        FROM documents)),
        |dist AS (
        |  SELECT b, COUNT(*) AS cr,
        |    SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        |  FROM toks GROUP BY b),
        |ds AS (SELECT b, (ct * 1000000) // cr AS s FROM dist),
        |sc AS (
        |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(ds.s) AS BIGINT) AS w_sum
        |  FROM toks t JOIN ds ON ds.b = t.b GROUP BY t.doc_id)
        |SELECT
        |  CAST(row_number() OVER (
        |    ORDER BY CAST(w_sum AS DOUBLE) / n_tokens DESC, doc_id)
        |    AS BIGINT) AS rank,
        |  doc_id, n_tokens, w_sum,
        |  CAST(w_sum AS DOUBLE) / n_tokens AS importance
        |FROM sc ORDER BY rank LIMIT 100""".stripMargin,
    "q128_lsh_recall" -> lshRecallOracleSql,
    "q130_pq_recall" -> pqRecallOracleSql,
    // both rank chains replayed, mutuality as a self-join of the bounded
    // top-k table on the reversed pair
    "q132_ivf_pq_recall" -> ivfPqRecallOracleSql,
    // q54's lag-gap sessions with (ts, id) ordering; first_value/lag
    // attribution inside the session partition
    "q135_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |g AS (
        |  SELECT *, SUM(CASE WHEN pd IS NULL OR tus - pd >= 21600000000
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY tus, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (SELECT *, LAG(tus) OVER (
        |          PARTITION BY user_id ORDER BY tus, event_id) AS pd
        |        FROM e)),
        |a AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    first_value(event_type) OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS first_touch,
        |    lag(event_type) OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id) AS last_touch,
        |    row_number() OVER (
        |      PARTITION BY user_id, sid ORDER BY tus, event_id) - 1
        |      AS n_prior
        |  FROM g)
        |SELECT user_id, event_id AS conv_event_id, tus AS conv_ts_us,
        |  first_touch, last_touch, CAST(n_prior AS BIGINT) AS n_prior_events
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY user_id, conv_ts_us, conv_event_id""".stripMargin,
    // (group, token)-grain then group-grain — exact longs, two divisions
    "q134_lexical_profile" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT source,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |    AS hapax_frac
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // q171's IVF mutual edges + q47/q67's recursive min-label reachability
    "q133_knn_clusters" ->
      s"""WITH RECURSIVE $ivfMutualSqlCte,
        |edges AS (SELECT id_a AS a, id_b AS b FROM mut
        |          UNION SELECT id_b, id_a FROM mut),
        |walk(id, lbl) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e2.b, w.lbl FROM walk w JOIN edges e2 ON e2.a = w.id),
        |comp AS (SELECT id, min(lbl) AS component FROM walk GROUP BY id)
        |SELECT e.vec_id AS id,
        |  coalesce(comp.component, e.vec_id) AS component,
        |  coalesce(comp.component, e.vec_id) = e.vec_id AS is_keeper
        |FROM embeddings e LEFT JOIN comp ON comp.id = e.vec_id
        |ORDER BY id""".stripMargin,
    "q131_mutual_knn" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS qid, c.vec_id AS nid,
        |    list_cosine_similarity(a.embedding, c.embedding) AS cos
        |  FROM embeddings a JOIN embeddings c ON c.vec_id <> a.vec_id),
        |topk AS (
        |  SELECT qid, nid, rank FROM (
        |    SELECT qid, nid, row_number() OVER (
        |      PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |    FROM pairs) WHERE rank <= 5)
        |SELECT f.qid AS id_a, f.nid AS id_b,
        |  CAST(f.rank AS BIGINT) AS rank_ab, CAST(r.rank AS BIGINT) AS rank_ba
        |FROM topk f JOIN topk r ON r.qid = f.nid AND r.nid = f.qid
        |WHERE f.qid < f.nid ORDER BY id_a, id_b""".stripMargin,
    // IVF twin of q131: one assignment CTE serves both the corpus bucketing
    // (r = 1) and the probe lists (r <= nprobe) — the same (cos desc,
    // cent_id) ordering graft's nearestCentroid/probeBuckets pin
    "q171_mutual_knn_ivf" ->
      s"""WITH $ivfMutualSqlCte
         |SELECT id_a, id_b,
         |  CAST(rank_ab AS BIGINT) AS rank_ab, CAST(rank_ba AS BIGINT) AS rank_ba
         |FROM mut ORDER BY id_a, id_b""".stripMargin,
    // q171's candidate chain minus mutuality, plus label joins: the
    // label-agreement audit over the same IVF top-5 lists
    "q175_knn_label_purity" ->
      s"""WITH $ivfTopkSqlCte
        |SELECT t.qid AS vec_id, ql.label,
        |  CAST(count(*) AS BIGINT) AS n_neighbors,
        |  CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same,
        |  CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS purity
        |FROM topk t
        |JOIN embeddings ql ON ql.vec_id = t.qid
        |JOIN embeddings nl ON nl.vec_id = t.nid
        |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin,
    // greedy max-coverage unrolled: q68's span screen -> affected docs ->
    // overlapping src:/lang: slices -> 3 argmax rounds, each discounting
    // the already-covered subset (the same ties and emptiness rule as
    // SetCover.greedyMaxCoverage: a round with no uncovered rows vanishes)
    "q176_set_cover" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |pd AS (SELECT DISTINCT s, doc_id FROM win),
        |nd AS (SELECT s FROM pd GROUP BY s HAVING COUNT(*) >= 2),
        |aff AS (SELECT DISTINCT doc_id FROM pd WHERE s IN (SELECT s FROM nd)),
        |memb AS (
        |  SELECT DISTINCT doc_id, slice FROM (
        |    SELECT a.doc_id, 'src:' || dd.source AS slice
        |    FROM aff a JOIN documents dd USING (doc_id)
        |    UNION ALL
        |    SELECT a.doc_id, 'lang:' || dd.lang
        |    FROM aff a JOIN documents dd USING (doc_id)) t0),
        |r1 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |cov1 AS (SELECT DISTINCT doc_id FROM memb
        |         WHERE slice IN (SELECT slice FROM r1)),
        |r2 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       WHERE doc_id NOT IN (SELECT doc_id FROM cov1)
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |cov2 AS (SELECT DISTINCT doc_id FROM memb
        |         WHERE slice IN (SELECT slice FROM r1 UNION SELECT slice FROM r2)),
        |r3 AS (SELECT slice, COUNT(*) AS c FROM memb
        |       WHERE doc_id NOT IN (SELECT doc_id FROM cov2)
        |       GROUP BY 1 ORDER BY c DESC, slice LIMIT 1),
        |allr AS (
        |  SELECT 1 AS round, slice AS picked_set, CAST(c AS BIGINT) AS newly_covered FROM r1
        |  UNION ALL SELECT 2, slice, CAST(c AS BIGINT) FROM r2
        |  UNION ALL SELECT 3, slice, CAST(c AS BIGINT) FROM r3)
        |SELECT CAST(round AS INTEGER) AS round, picked_set, newly_covered,
        |  CAST(SUM(newly_covered) OVER (ORDER BY round) AS BIGINT)
        |    AS cumulative_covered
        |FROM allr ORDER BY round""".stripMargin,
    // q94's per-user (µs, event_id) total order; EXISTS-based A-priori
    // prune mirrors the two semi-joins
    "q177_seq_trigrams" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
        |bg AS (SELECT t1 AS b1, t2 AS b2 FROM e WHERE t2 IS NOT NULL
        |       GROUP BY 1, 2 HAVING COUNT(DISTINCT u) >= 5),
        |tri AS (
        |  SELECT * FROM e
        |  WHERE t3 IS NOT NULL
        |    AND EXISTS (SELECT 1 FROM bg WHERE b1 = e.t1 AND b2 = e.t2)
        |    AND EXISTS (SELECT 1 FROM bg WHERE b1 = e.t2 AND b2 = e.t3))
        |SELECT t1, t2, t3, CAST(COUNT(DISTINCT u) AS BIGINT) AS support,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM tri GROUP BY 1, 2, 3 HAVING COUNT(DISTINCT u) >= 5
        |ORDER BY t1, t2, t3""".stripMargin,
    // CUPED: exact HUGEINT moments (Spark carries them in decimal(38,0) —
    // both are exact integers), doubles only in the final scalar formulas
    // with identical association
    "q178_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day < p.pivot THEN cents ELSE 0 END) AS xc,
        |    SUM(CASE WHEN day >= p.pivot THEN cents ELSE 0 END) AS yc
        |  FROM ev, p GROUP BY user_id),
        |g AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(xc) AS HUGEINT) AS sx, CAST(SUM(yc) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(xc AS HUGEINT) * yc) AS HUGEINT) AS sxy,
        |    CAST(SUM(CAST(xc AS HUGEINT) * xc) AS HUGEINT) AS sxx
        |  FROM pu),
        |th AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx_all FROM g),
        |pg AS (SELECT user_id % 2 AS grp, COUNT(*) AS n_users,
        |    CAST(SUM(xc) AS HUGEINT) AS sxg, CAST(SUM(yc) AS HUGEINT) AS syg
        |  FROM pu GROUP BY 1)
        |SELECT CAST(grp AS BIGINT) AS grp, CAST(n_users AS BIGINT) AS n_users,
        |  CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_pre,
        |  CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_post,
        |  (CAST(syg AS DOUBLE) / CAST(n_users AS DOUBLE)
        |    - theta * (CAST(sxg AS DOUBLE) / CAST(n_users AS DOUBLE) - mx_all))
        |    / 100.0 AS mean_adjusted,
        |  theta
        |FROM pg, th ORDER BY grp""".stripMargin,
    // three quantile_cont replays of the exact-median kernel (q106's
    // proven parity) on the deseasonalized residual chain
    "q180_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |m1 AS (SELECT event_type, day % 7 AS dow,
        |         quantile_cont(n, 0.5) AS expected
        |       FROM daily GROUP BY 1, 2),
        |r AS (SELECT d.event_type, d.day, d.n, m1.expected,
        |        d.n - m1.expected AS residual
        |      FROM daily d JOIN m1
        |        ON m1.event_type = d.event_type AND m1.dow = d.day % 7),
        |m2 AS (SELECT event_type, quantile_cont(residual, 0.5) AS med_resid
        |       FROM r GROUP BY 1),
        |r2 AS (SELECT r.*, m2.med_resid FROM r JOIN m2 USING (event_type)),
        |m3 AS (SELECT event_type,
        |         quantile_cont(ABS(residual - med_resid), 0.5) AS mad
        |       FROM r2 GROUP BY 1)
        |SELECT r2.event_type, r2.day, CAST(r2.n AS BIGINT) AS n, r2.expected,
        |  r2.residual, r2.med_resid, m3.mad,
        |  (ABS(r2.residual - r2.med_resid) > 3.0 * m3.mad) AS is_anomaly
        |FROM r2 JOIN m3 USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    // q115's edge rule; apex-capped wedge join replayed verbatim (full
    // degrees in the jaccard denominator, capped apexes in the numerator)
    "q181_common_neighbors" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |adj AS (SELECT u AS apex, v AS nb FROM e
        |        UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT apex AS node, CAST(COUNT(*) AS BIGINT) AS degree
        |        FROM adj GROUP BY 1),
        |capped AS (
        |  SELECT a.apex, a.nb FROM adj a JOIN deg d ON d.node = a.apex
        |  WHERE d.degree <= 128),
        |cn AS (
        |  SELECT w1.nb AS a, w2.nb AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
        |  FROM capped w1 JOIN capped w2 ON w1.apex = w2.apex AND w1.nb < w2.nb
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |ed AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b, true AS is_e
        |       FROM e)
        |SELECT cn.a AS id_a, cn.b AS id_b, cn.common_neighbors,
        |  da.degree AS deg_a, db.degree AS deg_b,
        |  CAST(cn.common_neighbors AS DOUBLE)
        |    / CAST(da.degree + db.degree - cn.common_neighbors AS DOUBLE)
        |    AS jaccard,
        |  coalesce(ed.is_e, false) AS is_edge
        |FROM cn
        |JOIN deg da ON da.node = cn.a
        |JOIN deg db ON db.node = cn.b
        |LEFT JOIN ed ON ed.a = cn.a AND ed.b = cn.b
        |ORDER BY id_a, id_b""".stripMargin,
    // q55's interval CTE over the non-purchase stream; purchases joined at
    // their own time AND at "current" — the correction-report rollup
    "q182_aswas_asis" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS t, MAX(event_type) AS status
        |  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, t, status,
        |    LAG(status) OVER (PARTITION BY user_id ORDER BY t) AS ps
        |  FROM c),
        |ch AS (SELECT user_id, t, status FROM l WHERE ps IS NULL OR ps <> status),
        |iv AS (
        |  SELECT user_id, status, t AS vf,
        |    LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS vt
        |  FROM ch),
        |f AS (SELECT user_id, epoch_us(ts) AS tf FROM events
        |      WHERE event_type = 'purchase'),
        |aswas AS (
        |  SELECT f.user_id, f.tf, d.status AS s_aswas
        |  FROM f LEFT JOIN iv d ON d.user_id = f.user_id
        |    AND d.vf <= f.tf AND (d.vt IS NULL OR f.tf < d.vt)),
        |asis AS (SELECT user_id, status AS s_asis FROM iv WHERE vt IS NULL),
        |j AS (SELECT a.*, i.s_asis FROM aswas a LEFT JOIN asis i USING (user_id))
        |SELECT coalesce(s_aswas, 'none') AS status_aswas,
        |  coalesce(s_asis, 'none') AS status_asis,
        |  CAST(COUNT(*) AS BIGINT) AS n_facts,
        |  coalesce(s_aswas, 'none') <> coalesce(s_asis, 'none') AS changed
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the ensemble spec prints itself as SQL — one source of truth for
    // both engines; features mirrored expression-for-expression
    "q185_tree_scoring" -> {
      val featSql: String => String = {
        case "n_chars" => "nc"
        case "n_tokens" => "nt"
        case "avg_len" => "al"
      }
      s"""WITH f AS (
         |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS nc,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS nt
         |  FROM documents),
         |f2 AS (SELECT doc_id, nc, nt, nc / nt AS al FROM f)
         |SELECT doc_id, ${qualityEnsemble.sql(featSql)} AS margin,
         |  (${qualityEnsemble.sql(featSql)} > 0.0) AS accept
         |FROM f2 ORDER BY doc_id""".stripMargin
    },
    // integer-unit fold (associative — fold order can't matter), one
    // final division mirrored on both sides
    "q186_hashed_linear" ->
      s"""SELECT doc_id,
         |  ${graft.operators.Scoring.hashedLinearMarginSql(
                "text", hashedWeightUnits, 5000L, 100000.0)} AS margin,
         |  (${graft.operators.Scoring.hashedLinearMarginSql(
                "text", hashedWeightUnits, 5000L, 100000.0)} > 0.0) AS flagged
         |FROM documents ORDER BY doc_id""".stripMargin,
    // LOO arithmetic mirrored term-for-term (exact integer counts, one
    // double division); singletons null in both engines
    "q187_target_encoding" ->
      """WITH j AS (
        |  SELECT o.o_orderkey, c.c_mktsegment AS segment,
        |    (o.o_orderpriority = '1-URGENT') AS urgent
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |s AS (SELECT segment, COUNT(*) AS n,
        |        SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS pos
        |      FROM j GROUP BY 1)
        |SELECT j.o_orderkey, j.segment, j.urgent,
        |  CASE WHEN s.n > 1 THEN
        |    (CAST(s.pos - (CASE WHEN j.urgent THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
        |      / (CAST(s.n - 1 AS DOUBLE) + 2.0)
        |  END AS enc
        |FROM j JOIN s USING (segment) ORDER BY o_orderkey""".stripMargin,
    // per-zone lag windows replayed verbatim; doubles only in the two
    // final ratios
    "q188_rle_audit" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k, l_linenumber AS ln, l_returnflag AS v
        |  FROM lineitem),
        |n1 AS (SELECT CAST((k - k % 1000) / 1000 AS BIGINT) AS z, v, k, ln FROM li),
        |m1 AS (SELECT z,
        |         CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
        |           THEN 1 ELSE 0 END AS nw
        |       FROM n1 WINDOW w AS (PARTITION BY z ORDER BY k, ln, v)),
        |m2 AS (SELECT v AS z,
        |         CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
        |           THEN 1 ELSE 0 END AS nw
        |       FROM li WINDOW w AS (PARTITION BY v ORDER BY k, ln, v)),
        |s1 AS (SELECT 'natural' AS layout, CAST(COUNT(DISTINCT z) AS BIGINT) AS zones,
        |         CAST(COUNT(*) AS BIGINT) AS rows_, CAST(SUM(nw) AS BIGINT) AS runs,
        |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE) AS avg_run_len,
        |         CAST(SUM(nw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rle_ratio
        |       FROM m1),
        |s2 AS (SELECT 'by_value' AS layout, CAST(COUNT(DISTINCT z) AS BIGINT) AS zones,
        |         CAST(COUNT(*) AS BIGINT) AS rows_, CAST(SUM(nw) AS BIGINT) AS runs,
        |         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE) AS avg_run_len,
        |         CAST(SUM(nw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rle_ratio
        |       FROM m2)
        |SELECT layout, zones, rows_ AS "rows", runs, avg_run_len, rle_ratio
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) t
        |ORDER BY layout""".stripMargin,
    // relational bloom: salted md5 positions; the position set and every
    // probe replay exactly (60-bit md5 values are non-negative, so % is
    // pmod)
    "q189_bloom_fpr" -> {
      val h = graft.functions.PortableHash.md5Hash60Sql(
        "CAST(j AS VARCHAR) || ':' || CAST(key AS VARCHAR)")
      s"""WITH dim AS (SELECT p_partkey AS key FROM part WHERE p_size >= 48),
         |pr AS (SELECT p_partkey AS key FROM part WHERE p_size < 48),
         |posset AS (
         |  SELECT DISTINCT ($h) % 512 AS pos
         |  FROM dim, generate_series(0, 2) AS g(j)),
         |pp AS (
         |  SELECT key, ($h) % 512 AS pos
         |  FROM pr, generate_series(0, 2) AS g(j)),
         |hit AS (
         |  SELECT pp.key, COUNT(*) AS np,
         |    SUM(CASE WHEN pp.pos IN (SELECT pos FROM posset)
         |      THEN 1 ELSE 0 END) AS nh
         |  FROM pp GROUP BY 1)
         |SELECT CAST(512 AS INTEGER) AS m, CAST(3 AS INTEGER) AS k,
         |  (SELECT CAST(COUNT(DISTINCT key) AS BIGINT) FROM dim) AS n_build,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM posset) AS n_bits_set,
         |  CAST(COUNT(*) AS BIGINT) AS n_probe,
         |  CAST(SUM(CASE WHEN np = nh THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_positive,
         |  CAST(SUM(CASE WHEN np = nh THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS fpr
         |FROM hit""".stripMargin
    },
    // order-independent HUGEINT checksum sums (Spark carries decimal(38,0));
    // IS NOT DISTINCT FROM is the null-safe twin of Spark's <=>
    "q190_checksum_reconcile" -> {
      val h = graft.functions.PortableHash.md5Hash60Sql(
        "concat_ws(':', event_id, user_id, event_type)")
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type,
         |    epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |b AS (SELECT * FROM ev WHERE event_id % 101 <> 0),
         |da AS (SELECT day AS part, CAST(COUNT(*) AS BIGINT) AS n_a,
         |         SUM(CAST(($h) AS HUGEINT)) AS ck_a
         |       FROM ev GROUP BY 1),
         |db AS (SELECT day AS part, CAST(COUNT(*) AS BIGINT) AS n_b,
         |         SUM(CAST(($h) AS HUGEINT)) AS ck_b
         |       FROM b GROUP BY 1)
         |SELECT coalesce(da.part, db.part) AS part,
         |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
         |  (coalesce(n_a, 0) = coalesce(n_b, 0)
         |    AND ck_a IS NOT DISTINCT FROM ck_b) AS match_ok
         |FROM da FULL OUTER JOIN db ON db.part = da.part
         |ORDER BY part""".stripMargin
    },
    // delta-grain maintenance: the oracle recomputes both aggregates and
    // keeps only batch-touched groups — equality proves delta == rebuild
    "q191_view_maintenance" ->
      """WITH ev AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type, event_id
        |  FROM events),
        |store AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS old_n
        |  FROM ev WHERE event_id % 17 <> 0 GROUP BY 1, 2),
        |add AS (
        |  SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS add_n
        |  FROM ev WHERE event_id % 17 = 0 GROUP BY 1, 2)
        |SELECT a.day, a.event_type,
        |  coalesce(s.old_n, 0) AS old_n,
        |  coalesce(s.old_n, 0) + a.add_n AS new_n,
        |  a.add_n AS delta_n
        |FROM add a LEFT JOIN store s USING (day, event_type)
        |ORDER BY day, event_type""".stripMargin,
    // exact HUGEINT moments; head/tail split at the same (count desc,
    // user) rank; doubles only in the estimate composition and ratio
    "q192_join_estimate" ->
      """WITH c AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY c DESC, user_id) AS rnk FROM c),
        |a AS (
        |  SELECT
        |    CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2,
        |    CAST(SUM(CASE WHEN rnk <= 10 THEN CAST(c AS HUGEINT) * c
        |      ELSE 0 END) AS HUGEINT) AS head_f2,
        |    CAST(SUM(CASE WHEN rnk > 10 THEN c ELSE 0 END) AS BIGINT) AS tail_n,
        |    CAST(SUM(CASE WHEN rnk > 10 THEN 1 ELSE 0 END) AS BIGINT) AS tail_d
        |  FROM r)
        |SELECT CAST(f2 AS DOUBLE) AS true_f2,
        |  (CAST(head_f2 AS DOUBLE) +
        |    CASE WHEN tail_d > 0 THEN
        |      CAST(CAST(tail_n AS HUGEINT) * tail_n AS DOUBLE)
        |        / CAST(tail_d AS DOUBLE)
        |    ELSE 0.0 END) AS est_f2,
        |  ((CAST(head_f2 AS DOUBLE) +
        |    CASE WHEN tail_d > 0 THEN
        |      CAST(CAST(tail_n AS HUGEINT) * tail_n AS DOUBLE)
        |        / CAST(tail_d AS DOUBLE)
        |    ELSE 0.0 END) - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE) AS rel_err
        |FROM a""".stripMargin,
    // DuckDB's grouping(a, b) bitmask matches Spark's grouping_id()
    // (first cube column = MSB — probed, not assumed)
    "q193_cube_rollup" ->
      """SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
        |  CAST(grouping(c.c_mktsegment, o.o_orderpriority) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
        |ORDER BY gid, segment, priority""".stripMargin,
    // three rungs of the same class-size screen; only the class key
    // coarsens
    "q194_generalization_ladder" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_acctbal FROM customer),
        |r1 AS (SELECT concat_ws(':', nation,
        |         CAST(floor(c_acctbal / 100) AS BIGINT)) AS cls,
        |         COUNT(*) AS n FROM c GROUP BY 1),
        |r2 AS (SELECT concat_ws(':', nation,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT)) AS cls,
        |         COUNT(*) AS n FROM c GROUP BY 1),
        |r3 AS (SELECT CAST(nation AS VARCHAR) AS cls, COUNT(*) AS n
        |       FROM c GROUP BY 1),
        |s AS (
        |  SELECT 'w100' AS rung, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_at_risk,
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
        |      AS rows_suppressed,
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE) AS suppression_rate
        |  FROM r1
        |  UNION ALL
        |  SELECT 'w1000', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE)
        |  FROM r2
        |  UNION ALL
        |  SELECT 'nation_only', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT),
        |    CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS DOUBLE)
        |      / CAST(SUM(n) AS DOUBLE)
        |  FROM r3)
        |SELECT * FROM s ORDER BY rung""".stripMargin,
    // positional bigrams ≡ the Spark lead() pairs; threshold compare on
    // one exact-count double division — no transcendentals anywhere
    "q195_rare_transitions" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, w[i] AS a, w[i + 1] AS b
        |  FROM d, unnest(generate_series(1, len(w) - 1)) AS u(i)
        |  WHERE len(w) >= 2),
        |cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
        |        FROM inst GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c_a FROM inst GROUP BY 1),
        |m AS (SELECT cab.a, cab.b,
        |        CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE) AS p
        |      FROM cab JOIN ca USING (a))
        |SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS rare_frac,
        |  (CAST(SUM(CASE WHEN m.p < 0.01 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) > 0.3) AS suspicious
        |FROM inst i JOIN m ON m.a = i.a AND m.b = i.b
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // one per-user window pass; churn attributed to the first silent
    // week, bounded by the observed range
    "q196_growth_accounting" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id AS k,
        |    (epoch_ns(ts) // 86400000000000) // 7 AS w
        |  FROM events),
        |mx AS (SELECT MAX(w) AS mw FROM act),
        |lane AS (
        |  SELECT k, w,
        |    MIN(w) OVER (PARTITION BY k) AS first_w,
        |    LAG(w) OVER (PARTITION BY k ORDER BY w) AS prev_w,
        |    LEAD(w) OVER (PARTITION BY k ORDER BY w) AS next_w
        |  FROM act),
        |states AS (
        |  SELECT w AS period, CAST(COUNT(*) AS BIGINT) AS n_active,
        |    CAST(SUM(CASE WHEN w = first_w THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(SUM(CASE WHEN prev_w = w - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_retained,
        |    CAST(SUM(CASE WHEN prev_w IS NOT NULL AND prev_w < w - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM lane GROUP BY 1),
        |churn AS (
        |  SELECT w + 1 AS period, CAST(COUNT(*) AS BIGINT) AS n_churned
        |  FROM lane, mx
        |  WHERE (next_w IS NULL OR next_w > w + 1) AND w + 1 <= mw
        |  GROUP BY 1)
        |SELECT coalesce(s.period, c.period) AS period,
        |  coalesce(n_active, 0) AS n_active, coalesce(n_new, 0) AS n_new,
        |  coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM states s FULL OUTER JOIN churn c ON c.period = s.period
        |ORDER BY period""".stripMargin,
    // q125's contribution-explode for the WAU side; the dau join bounds
    // the series to observed days
    "q197_stickiness" ->
      """WITH p AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS d, user_id
        |  FROM events),
        |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
        |        FROM p GROUP BY 1),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM (
        |          SELECT DISTINCT d + x AS day, user_id
        |          FROM p, unnest(generate_series(0, 6)) AS g(x)) t
        |        GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    // expected/chi2 computed once in CTEs; identical association both
    // sides; 3.8415 = the 1-dof 5% critical value
    "q198_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (SELECT user_id % 2 AS grp, COUNT(*) AS n FROM u GROUP BY 1),
        |a AS (SELECT
        |  CAST(SUM(CASE WHEN grp = 0 THEN n ELSE 0 END) AS BIGINT) AS n_0,
        |  CAST(SUM(CASE WHEN grp = 1 THEN n ELSE 0 END) AS BIGINT) AS n_1
        |  FROM arms),
        |e AS (SELECT n_0, n_1,
        |        CAST(n_0 + n_1 AS DOUBLE) / 2.0 AS expected FROM a),
        |c AS (SELECT n_0, n_1, expected,
        |        (CAST(n_0 AS DOUBLE) - expected) * (CAST(n_0 AS DOUBLE) - expected)
        |          / expected
        |        + (CAST(n_1 AS DOUBLE) - expected) * (CAST(n_1 AS DOUBLE) - expected)
        |          / expected AS chi2
        |      FROM e)
        |SELECT n_0, n_1, expected, chi2,
        |  (chi2 > 3.841458820694124) AS srm_flag
        |FROM c""".stripMargin,
    // 9 blocks generated from the SAME layout/probe spec the Spark side
    // uses (q185's one-spec-two-faces discipline); each block is q108's
    // zone-map arithmetic
    "q201_index_advisor" -> {
      val blocks = for {
        (lname, zsql) <- advisorLayouts
        (pname, statSql, loSql, hiSql) <- advisorProbes
      } yield
        s"""SELECT '$lname' AS layout, '$pname' AS probe,
           |  CAST(COUNT(*) AS BIGINT) AS zones_total,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN n END), 0) AS BIGINT) AS rows_scanned,
           |  CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched,
           |  CAST(COALESCE(SUM(CASE WHEN mx >= $loSql AND mn <= $hiSql
           |    THEN n END), 0) AS DOUBLE)
           |    / CAST(COALESCE(SUM(n), 0) AS DOUBLE) AS frac_scanned
           |FROM (
           |  SELECT $zsql AS z, COUNT(*) AS n,
           |    MIN($statSql) AS mn, MAX($statSql) AS mx,
           |    SUM(CASE WHEN $statSql BETWEEN $loSql AND $hiSql
           |      THEN 1 ELSE 0 END) AS m
           |  FROM lineitem
           |  WHERE $zsql IS NOT NULL AND $statSql IS NOT NULL
           |  GROUP BY 1) zz""".stripMargin
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY layout, probe")
    },
    // exact decimal/HUGEINT moments; the slope/intercept/forecast chain
    // mirrored operation-for-operation
    "q202_token_forecast" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |        MAX(x) AS x_max
        |      FROM daily),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n, x_max FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    x_max FROM fit)
        |SELECT CAST(x_max + g.d AS BIGINT) AS day,
        |  intercept + slope * CAST(x_max + g.d AS DOUBLE) AS forecast_events,
        |  slope, intercept
        |FROM fit2, generate_series(1, 7) AS g(d)
        |ORDER BY day""".stripMargin,
    // per-point best/second-best centroid in the double dot-product
    // domain; medians via quantile_cont (the q106 kernel parity)
    "q203_cluster_silhouette" ->
      """WITH emb2 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2),
        |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |            v AS cv, nrm AS cn
        |          FROM e ORDER BY vec_id LIMIT 16),
        |asg AS (
        |  SELECT p.vec_id AS id, c.cid,
        |    1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
        |    row_number() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
        |               c.cid) AS r
        |  FROM e p, cents c),
        |pp AS (
        |  SELECT a1.id, CAST(a1.cid AS INTEGER) AS cluster,
        |    a1.dist AS intra, a2.dist AS other, a2.dist - a1.dist AS margin
        |  FROM asg a1 JOIN asg a2 ON a2.id = a1.id AND a2.r = 2
        |  WHERE a1.r = 1)
        |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
        |  quantile_cont(intra, 0.5) AS med_intra,
        |  quantile_cont(other, 0.5) AS med_other,
        |  quantile_cont(margin, 0.5) AS med_margin,
        |  (quantile_cont(margin, 0.5) > 0.0) AS healthy
        |FROM pp GROUP BY 1 ORDER BY cluster""".stripMargin,
    // one global running max (fine at oracle scale), candidates unnested
    "q204_watermark_planner" ->
      """WITH b AS (SELECT event_id AS o, CAST(epoch_us(ts) AS BIGINT) AS t
        |           FROM events),
        |rm AS (SELECT o, t,
        |         MAX(t) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING) AS runmax
        |       FROM b),
        |l AS (SELECT runmax - t AS late FROM rm),
        |c AS (SELECT unnest([60000000, 300000000, 1800000000]) AS watermark)
        |SELECT CAST(c.watermark AS BIGINT) AS watermark,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN l.late > c.watermark THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(SUM(CASE WHEN l.late > c.watermark THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS drop_frac
        |FROM l, c GROUP BY 1 ORDER BY watermark""".stripMargin,
    // exact-cents cell means, MAX-pivot (one row per cell), mirrored
    // subtraction association
    "q205_did_readout" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS pivot FROM ev),
        |cells AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN day >= p.pivot THEN 1 ELSE 0 END AS period,
        |    CAST(SUM(cents) AS HUGEINT) AS s, COUNT(*) AS n
        |  FROM ev, p GROUP BY 1, 2),
        |m AS (SELECT arm, period,
        |        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean
        |      FROM cells),
        |piv AS (SELECT
        |  MAX(CASE WHEN arm = 0 AND period = 0 THEN mean END) AS m00,
        |  MAX(CASE WHEN arm = 0 AND period = 1 THEN mean END) AS m01,
        |  MAX(CASE WHEN arm = 1 AND period = 0 THEN mean END) AS m10,
        |  MAX(CASE WHEN arm = 1 AND period = 1 THEN mean END) AS m11
        |  FROM m)
        |SELECT m00, m01, m10, m11,
        |  (m11 - m10) - (m01 - m00) AS did
        |FROM piv""".stripMargin,
    // q202's fit + R-7 residual quantiles (the exact-quantile kernel
    // parity); band edges are one addition each
    "q207_forecast_bands" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS x,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |        MAX(x) AS x_max
        |      FROM daily),
        |fit AS (SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |    sy, sx, n, x_max FROM m),
        |fit2 AS (SELECT slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS intercept,
        |    x_max FROM fit),
        |res AS (SELECT CAST(y AS DOUBLE)
        |          - (intercept + slope * CAST(x AS DOUBLE)) AS r
        |        FROM daily, fit2),
        |b AS (SELECT quantile_cont(r, 0.1) AS q10,
        |        quantile_cont(r, 0.9) AS q90 FROM res)
        |SELECT CAST(x_max + g.d AS BIGINT) AS day,
        |  intercept + slope * CAST(x_max + g.d AS DOUBLE) AS forecast_events,
        |  (intercept + slope * CAST(x_max + g.d AS DOUBLE)) + q10 AS lo,
        |  (intercept + slope * CAST(x_max + g.d AS DOUBLE)) + q90 AS hi
        |FROM fit2, b, generate_series(1, 7) AS g(d)
        |ORDER BY day""".stripMargin,
    // brute force every (length, start) token gram (docs are <= 100 tokens,
    // so sum len^2/2 is small at oracle scale); the Spark side never
    // enumerates grams - full-depth suffix ranks + adjacent cross-doc LCP
    "q208_max_dup_substring" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, l.l AS len,
        |    array_to_string(w[s.s : s.s + l.l - 1], ' ') AS gram
        |  FROM d,
        |    unnest(generate_series(1, len(w))) AS l(l),
        |    unnest(generate_series(1, len(w) - l.l + 1)) AS s(s)),
        |dup AS (
        |  SELECT len, gram FROM g
        |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2),
        |best AS (
        |  SELECT g.doc_id, CAST(max(g.len) AS BIGINT) AS m
        |  FROM g JOIN dup USING (len, gram) GROUP BY 1)
        |SELECT d2.doc_id,
        |  CAST(coalesce(b.m, 0) AS BIGINT) AS max_dup_substring_tokens
        |FROM documents d2 LEFT JOIN best b ON d2.doc_id = b.doc_id
        |ORDER BY d2.doc_id""".stripMargin,
    // q180's residual chain + one raw-MAD pass; strength clipped at 0
    "q206_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM events GROUP BY 1, 2),
        |m1 AS (SELECT event_type, day % 7 AS dow,
        |         quantile_cont(n, 0.5) AS expected
        |       FROM daily GROUP BY 1, 2),
        |r AS (SELECT d.event_type, d.day, d.n,
        |        d.n - m1.expected AS residual
        |      FROM daily d JOIN m1
        |        ON m1.event_type = d.event_type AND m1.dow = d.day % 7),
        |m2 AS (SELECT event_type, quantile_cont(residual, 0.5) AS med_resid
        |       FROM r GROUP BY 1),
        |mres AS (SELECT r.event_type,
        |           quantile_cont(ABS(r.residual - m2.med_resid), 0.5) AS mad_resid
        |         FROM r JOIN m2 USING (event_type) GROUP BY 1),
        |mr AS (SELECT event_type, quantile_cont(n, 0.5) AS med_raw
        |       FROM daily GROUP BY 1),
        |mraw AS (SELECT d.event_type,
        |           quantile_cont(ABS(d.n - mr.med_raw), 0.5) AS mad_raw
        |         FROM daily d JOIN mr USING (event_type) GROUP BY 1)
        |SELECT mraw.event_type, mraw.mad_raw, mres.mad_resid,
        |  CASE WHEN mraw.mad_raw > 0.0 THEN
        |    greatest(0.0, 1.0 - mres.mad_resid / mraw.mad_raw)
        |  END AS strength
        |FROM mraw JOIN mres USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // q126's quasi discipline with segment as the SENSITIVE attribute
    "q179_l_diversity" ->
      """WITH q AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
        |    c_mktsegment AS segment
        |  FROM customer),
        |sc AS (SELECT nation, bal_bucket, segment, COUNT(*) AS c
        |       FROM q GROUP BY 1, 2, 3)
        |SELECT nation, bal_bucket,
        |  CAST(SUM(c) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_share,
        |  (COUNT(*) < 2) AS at_risk
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Gonzalez k-center unrolled as chained CTEs: selection argmax in the
    // DIST domain (least of 1-cos), assignment in the COS domain (q17's
    // rule) — the exact domain split Coreset.kCenterAssign pins
    "q172_kcenter_coreset" ->
      s"""WITH ${kcenterSqlCte("")},
         |asg AS (
         |  SELECT p.vec_id AS id, c.cid, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM e p, cents c)
         |SELECT id, cid AS center_id, CAST(rnk AS INTEGER) AS center_rank, dist
         |FROM asg WHERE r = 1 ORDER BY id""".stripMargin,
    // the store's centers (old rows only) + radius, probed by the batch:
    // both assignments replay the same double-path cosine chain
    "q184_coreset_drift" ->
      s"""WITH ${kcenterSqlCte("WHERE vec_id % 10 <> 0")},
         |asgo AS (
         |  SELECT p.vec_id AS id, c.cid, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM e p, cents c),
         |olda AS (SELECT id, cid, rnk, dist FROM asgo WHERE r = 1),
         |rad AS (SELECT rnk, MAX(cid) AS center_id, MAX(dist) AS radius
         |        FROM olda GROUP BY 1),
         |emb2b AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |eb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb2b),
         |asgb AS (
         |  SELECT p.vec_id AS id, c.rnk,
         |         1.0 - list_dot_product(p.v, c.cv) / (p.nrm * c.cn) AS dist,
         |         row_number() OVER (PARTITION BY p.vec_id
         |           ORDER BY list_dot_product(p.v, c.cv) / (p.nrm * c.cn) DESC,
         |                    c.rnk) AS r
         |  FROM eb p, cents c),
         |newa AS (SELECT id, rnk, dist FROM asgb WHERE r = 1),
         |st AS (
         |  SELECT n.rnk, CAST(COUNT(*) AS BIGINT) AS n_new,
         |    MAX(n.dist) AS max_dist_new,
         |    CAST(SUM(CASE WHEN n.dist > rad.radius THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_beyond
         |  FROM newa n JOIN rad ON rad.rnk = n.rnk GROUP BY 1)
         |SELECT CAST(rad.rnk AS INTEGER) AS center_rank, rad.center_id,
         |  rad.radius, coalesce(st.n_new, 0) AS n_new, st.max_dist_new,
         |  coalesce(st.n_beyond, 0) AS n_beyond
         |FROM rad LEFT JOIN st ON st.rnk = rad.rnk ORDER BY center_rank""".stripMargin,
    // full-recompute oracle: parity PROVES the incremental count-state
    // merge equals a rescan of all history (disjoint count sums)
    "q183_profile_store" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |tc AS (SELECT user_id, event_type, COUNT(*) AS c FROM ev GROUP BY 1, 2),
        |fav AS (SELECT user_id, event_type AS fav_type FROM (
        |          SELECT user_id, event_type,
        |            row_number() OVER (PARTITION BY user_id
        |              ORDER BY c DESC, event_type ASC) AS r
        |          FROM tc) t WHERE r = 1)
        |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MAX(e.cents) AS max_cents, MAX(e.day) AS last_day, f.fav_type
        |FROM ev e JOIN fav f USING (user_id)
        |GROUP BY 1, 5 ORDER BY user_id""".stripMargin,
    // relational minimax isotonic fit: interval means on exact BIGINT
    // prefix sums; min/max over doubles are rounding-monotone, so the fit
    // is bit-identical to Spark's
    "q173_isotonic_calibration" ->
      """WITH emb2 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    label
        |  FROM embeddings),
        |e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, label
        |      FROM emb2),
        |a AS (
        |  SELECT vec_id AS aid, v AS avec, nrm AS anrm, label AS albl
        |  FROM e ORDER BY vec_id LIMIT 1),
        |s AS (
        |  SELECT least(31, greatest(0, CAST(floor(
        |           (list_dot_product(e.v, a.avec) / (e.nrm * a.anrm) - (-1.0))
        |             / 2.0 * 32) AS INTEGER))) AS bin,
        |         (e.label = a.albl) AS y
        |  FROM e, a WHERE e.vec_id <> a.aid),
        |b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |      FROM s GROUP BY 1),
        |seq AS (SELECT *, CAST(row_number() OVER (ORDER BY bin) - 1 AS INTEGER) AS i
        |        FROM b),
        |pre AS (SELECT *,
        |          CAST(sum(n) OVER (ORDER BY i) AS BIGINT) AS cn,
        |          CAST(sum(pos) OVER (ORDER BY i) AS BIGINT) AS cp
        |        FROM seq),
        |iv AS (
        |  SELECT s2.i AS j, e2.i AS k,
        |         CAST(e2.cp - (s2.cp - s2.pos) AS DOUBLE)
        |           / CAST(e2.cn - (s2.cn - s2.n) AS DOUBLE) AS avg
        |  FROM pre s2 JOIN pre e2 ON s2.i <= e2.i),
        |inn AS (
        |  SELECT p.i, iv.j, min(iv.avg) AS mn
        |  FROM pre p JOIN iv ON iv.j <= p.i AND iv.k >= p.i
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, max(mn) AS iso_rate FROM inn GROUP BY 1)
        |SELECT CAST(pre.bin AS INTEGER) AS bin, pre.n, pre.pos,
        |  CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE) AS raw_rate,
        |  fit.iso_rate
        |FROM pre JOIN fit USING (i) ORDER BY bin""".stripMargin,
    // q113's brute-force differential, containment flavor: the oracle
    // shares only the C(A,B) = |A∩B|/|A| definition with the Spark side
    "q127_containment" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b,
        |  CAST(m AS DOUBLE) / ca.n AS containment
        |FROM inter
        |JOIN counts ca ON ca.doc_id = ia
        |JOIN counts cb ON cb.doc_id = ib
        |WHERE (ca.n < cb.n OR (ca.n = cb.n AND ia < ib))
        |  AND ca.n >= 10
        |  AND CAST(m AS DOUBLE) / ca.n >= CAST(0.9 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    // class-grain audit: one aggregate on the quasi projection; floor of
    // an exact double division buckets identically in both engines
    "q126_k_anonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  c_mktsegment AS segment,
        |  CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  (COUNT(*) < 5) AS at_risk,
        |  CAST(1.0 AS DOUBLE) / COUNT(*) AS risk
        |FROM customer
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // contribution-explode rolling distinct: each distinct (day, user)
    // pair is visible from 7 window-end days, clipped to observed range
    "q125_sliding_distinct" -> slidingDistinctOracleSql,
    // q125's one-shot series IS q129's oracle — the incremental update
    // must be indistinguishable from it (the q112 argument)
    "q129_sliding_distinct_inc" -> slidingDistinctOracleSql,
    // q117's lift arithmetic over the windowed unordered pair stream
    "q121_skipgram" ->
      """WITH d AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM d),
        |pg AS (
        |  SELECT least(t[i], t[i+j]) AS x, greatest(t[i], t[i+j]) AS y
        |  FROM d, unnest(generate_series(1, len(t))) AS u(i),
        |       unnest(generate_series(1, 3)) AS v(j)
        |  WHERE len(t) >= 2 AND i + j <= len(t)),
        |uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        |bc AS (SELECT x, y, COUNT(*) AS c_xy FROM pg GROUP BY x, y
        |       HAVING COUNT(*) >= 5),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |m AS (SELECT COUNT(*) AS mm FROM pg)
        |SELECT bc.x, bc.y, bc.c_xy,
        |  CAST(bc.c_xy AS DOUBLE) * n.nn * n.nn /
        |    (CAST(m.mm AS DOUBLE) * ux.c * uy.c) AS lift
        |FROM bc
        |JOIN uc ux ON ux.tok = bc.x
        |JOIN uc uy ON uy.tok = bc.y
        |CROSS JOIN n CROSS JOIN m
        |ORDER BY lift DESC, bc.x, bc.y LIMIT 50""".stripMargin,
    // the same fixed-point recurrence as the Scala loop, unrolled: all
    // arithmetic is BIGINT floor division, so 10 iterations replay exactly
    "q120_pagerank" -> {
      val iters = (1 to 10).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        s"""s$k AS (SELECT d.node, d.outdeg,
           |  (15000000000000 // (100 * nn.n)) + (85 * COALESCE(c.s, 0)) // 100
           |    AS score
           |  FROM deg d CROSS JOIN nn
           |  LEFT JOIN (SELECT e.dst, CAST(SUM(s.score // s.outdeg) AS BIGINT) AS s
           |             FROM ed e JOIN $prev s ON s.node = e.src GROUP BY e.dst) c
           |  ON c.dst = d.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |pairs AS (
         |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
         |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
         |ed AS (SELECT pa AS src, pb AS dst FROM pairs
         |       UNION ALL SELECT pb, pa FROM pairs),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM ed GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |s0 AS (SELECT node, outdeg, 1000000000000 // nn.n AS score
         |       FROM deg CROSS JOIN nn),
         |$iters
         |SELECT node AS part, score FROM s10
         |ORDER BY score DESC, part LIMIT 100""".stripMargin
    },
    // q56's BM25 rank chain + q16's cosine rank chain (queries 1-3, k=10
    // both), fused with the fixed-order two-term RRF sum — rank-only, so
    // the float-vs-double cosine difference never reaches the compare
    "q119_hybrid_rrf" -> {
      val vals = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
      val inList = bm25Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
      val qidList = bm25Queries.map(_._1).mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $vals),
         |base AS (
         |  SELECT id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
         |  FROM (SELECT doc_id AS id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS tk
         |        FROM documents)),
         |tfq AS (
         |  SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
         |  FROM base WHERE term IN ($inList) GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfq GROUP BY 1),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    AVG(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE))
         |      AS avgdl
         |  FROM documents),
         |scored AS (
         |  SELECT q.query_id, tfq.id,
         |    CAST(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * tfq.tf * 2.2
         |      / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfq.dl / s.avgdl))
         |      AS DECIMAL(38,12)) AS sc
         |  FROM tfq JOIN q ON q.term = tfq.term
         |  JOIN dfc d ON d.term = tfq.term, stats s),
         |agg AS (SELECT query_id, id, SUM(sc) AS score FROM scored GROUP BY 1, 2),
         |bm AS (
         |  SELECT query_id, doc_id, r FROM (
         |    SELECT query_id, id AS doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS r
         |    FROM agg) t WHERE r <= 10),
         |qe AS (SELECT vec_id AS query_id, embedding AS qv
         |       FROM embeddings WHERE vec_id IN ($qidList)),
         |cpairs AS (
         |  SELECT qe.query_id, c.vec_id AS doc_id,
         |         list_cosine_similarity(qe.qv, c.embedding) AS cos
         |  FROM qe JOIN embeddings c ON c.vec_id <> qe.query_id),
         |cs AS (
         |  SELECT query_id, doc_id, r FROM (
         |    SELECT query_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS r
         |    FROM cpairs) t WHERE r <= 10),
         |f AS (
         |  SELECT COALESCE(bm.query_id, cs.query_id) AS query_id,
         |         COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
         |         COALESCE(1.0 / (60 + bm.r), 0.0) + COALESCE(1.0 / (60 + cs.r), 0.0)
         |           AS rrf_score
         |  FROM bm FULL OUTER JOIN cs
         |    ON bm.query_id = cs.query_id AND bm.doc_id = cs.doc_id)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, rrf_score
         |FROM f
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q118_group_split" -> {
      val b = graft.operators.Splits.bucketSql("source")
      s"""WITH a AS (
         |  SELECT source,
         |    CASE WHEN $b < 800000 THEN 'train'
         |         WHEN $b < 900000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |s AS (SELECT source, split, COUNT(*) AS rws FROM a GROUP BY 1, 2),
         |g AS (SELECT split, COUNT(*) AS n_groups,
         |      CAST(SUM(rws) AS BIGINT) AS n_rows
         |      FROM s GROUP BY split),
         |t AS (SELECT SUM(n_rows) AS total FROM g)
         |SELECT g.split, g.n_groups, g.n_rows,
         |  CAST(CASE g.split WHEN 'train' THEN 800000
         |       WHEN 'val' THEN 100000 ELSE 100000 END AS BIGINT)
         |    AS rows_ppm_target,
         |  CAST(FLOOR(g.n_rows * 1000000 / t.total) AS BIGINT)
         |    AS rows_ppm_achieved
         |FROM g CROSS JOIN t ORDER BY g.split""".stripMargin
    },
    // lift arithmetic mirrors the Spark column order exactly:
    // ((c_xy * N) * N) / ((M * c_x) * c_y), all IEEE-correctly-rounded
    "q117_collocations" ->
      """WITH d AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS tok FROM d),
        |bg AS (
        |  SELECT t[i] AS x, t[i+1] AS y
        |  FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        |bc AS (SELECT x, y, COUNT(*) AS c_xy FROM bg GROUP BY x, y
        |       HAVING COUNT(*) >= 3),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |m AS (SELECT COUNT(*) AS mm FROM bg)
        |SELECT bc.x, bc.y, bc.c_xy,
        |  CAST(bc.c_xy AS DOUBLE) * n.nn * n.nn /
        |    (CAST(m.mm AS DOUBLE) * ux.c * uy.c) AS lift
        |FROM bc
        |JOIN uc ux ON ux.tok = bc.x
        |JOIN uc uy ON uy.tok = bc.y
        |CROSS JOIN n CROSS JOIN m
        |ORDER BY lift DESC, bc.x, bc.y LIMIT 50""".stripMargin,
    // q85's range chain + the cut: original-case tokens anti-filtered by
    // position against the ranges, rejoined with single spaces
    "q87_cut_spans" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t,
        |         string_split_regex(trim(text), '\s+') AS torig
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS sp, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |duph AS (
        |  SELECT s FROM (SELECT s, doc_id FROM win GROUP BY 1, 2)
        |  GROUP BY s HAVING COUNT(*) >= 2),
        |dup AS (SELECT doc_id, sp FROM win WHERE s IN (SELECT s FROM duph)),
        |isl AS (
        |  SELECT doc_id, sp,
        |    SUM(CASE WHEN psp IS NULL OR sp - psp > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY sp) AS island
        |  FROM (SELECT doc_id, sp,
        |          LAG(sp) OVER (PARTITION BY doc_id ORDER BY sp) AS psp
        |        FROM dup)),
        |rng AS (
        |  SELECT doc_id, MIN(sp) AS a, MAX(sp) + 7 AS b
        |  FROM isl GROUP BY doc_id, island),
        |tokpos AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS p, torig[i] AS tok
        |  FROM d, unnest(generate_series(1, len(torig))) AS u(i)),
        |kept AS (
        |  SELECT tp.doc_id, tp.p, tp.tok FROM tokpos tp
        |  WHERE NOT EXISTS (SELECT 1 FROM rng r
        |                    WHERE r.doc_id = tp.doc_id AND tp.p BETWEEN r.a AND r.b))
        |SELECT d2.doc_id, COALESCE(k.text, '') AS text,
        |  CAST(d2.n - COALESCE(k.n, 0) AS BIGINT) AS n_cut
        |FROM (SELECT doc_id, len(torig) AS n FROM d) d2
        |LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
        |             COUNT(*) AS n FROM kept GROUP BY doc_id) k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // q89: every ratio is exact-int / exact-int divided once; literal
    // counts via the length/replace trick (replace-with-empty, so the
    // divisor is len(sub)) — bit-identical across engines
    "q89_gopher_rules" -> s"$gopherRulesSql\nORDER BY doc_id",
    // q88: character indexing on VARCHAR replays Spark's split-on-"" at
    // the word grain; LIMIT ties broken by (n desc, a, b) total order
    "q88_bpe_pairs" ->
      """WITH w AS (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |        FROM documents)
        |  WHERE length(word) > 0 GROUP BY word),
        |p AS (
        |  SELECT word[i] AS a, word[i+1] AS b, freq
        |  FROM w, unnest(generate_series(1, length(word) - 1)) AS u(i))
        |SELECT a, b, CAST(SUM(freq) AS BIGINT) AS n
        |FROM p GROUP BY a, b ORDER BY n DESC, a, b LIMIT 20""".stripMargin,
    "q69_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, term, tf,
        |        CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
        |      FROM tf),
        |r AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS BIGINT) AS rank
        |      FROM d)
        |SELECT doc_id, rank, term, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q70_epoch_shards" -> {
      val k = graft.functions.PortableHash.md5Hash60Sql("'3:' || CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t,
         |    $k AS k
         |  FROM documents),
         |s AS (SELECT doc_id, t, k, CAST(k % 8 AS INTEGER) AS shard FROM a),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rn
         |      FROM s)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens,
         |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin
    },
    "q71_weighted_sample" -> {
      val k = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
         |    ($k % 1000000000) AS h
         |  FROM documents),
         |p AS (SELECT doc_id, w, CAST(h // w AS BIGINT) AS priority FROM d)
         |SELECT doc_id, w, priority FROM p
         |ORDER BY priority, doc_id LIMIT 50""".stripMargin
    },
    // the q58 vocabulary CTE verbatim, then an order-preserving encode
    "q72_token_ids" ->
      """WITH t0 AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t0
        |  GROUP BY term HAVING COUNT(*) >= 5
        |  ORDER BY n DESC, term LIMIT 100),
        |v AS (
        |  SELECT term,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS vocab_id
        |  FROM c),
        |toks AS (
        |  SELECT doc_id, i AS pos, l[i] AS term
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |        FROM documents),
        |    unnest(generate_series(1, len(l))) AS u(i)),
        |j AS (
        |  SELECT toks.doc_id, toks.pos, COALESCE(v.vocab_id, 0) AS vid
        |  FROM toks LEFT JOIN v USING (term))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN vid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(CAST(vid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q73_length_batches" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS len
        |  FROM documents),
        |r AS (SELECT doc_id, len,
        |        ROW_NUMBER() OVER (ORDER BY len DESC, doc_id) - 1 AS rn
        |      FROM d),
        |b AS (SELECT doc_id, len, CAST(rn // 32 AS BIGINT) AS batch FROM r)
        |SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MAX(len) AS BIGINT) AS max_len,
        |  CAST(SUM(len) AS BIGINT) AS sum_len,
        |  CAST(COUNT(*) * MAX(len) - SUM(len) AS BIGINT) AS pad_waste
        |FROM b GROUP BY batch ORDER BY batch""".stripMargin,
    "q74_dup_spans_inc" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |win AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
        |  FROM d, unnest(generate_series(1, len(t) - 7)) AS u(i)
        |  WHERE len(t) >= 8),
        |nw AS (SELECT * FROM win WHERE doc_id % 7 = 0),
        |store AS (SELECT DISTINCT s FROM win WHERE doc_id % 7 <> 0),
        |pd AS (SELECT s, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM nw GROUP BY 1, 2),
        |nd AS (
        |  SELECT pd.s, pd.doc_id, pd.c,
        |    COUNT(*) OVER (PARTITION BY pd.s) AS ndocs,
        |    store.s IS NOT NULL AS in_store
        |  FROM pd LEFT JOIN store ON pd.s = store.s)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 OR in_store THEN c ELSE 0 END) AS BIGINT)
        |    AS dup_windows,
        |  CAST(SUM(CASE WHEN ndocs >= 2 OR in_store THEN c ELSE 0 END) AS DOUBLE)
        |    / SUM(c) AS dup_frac
        |FROM nd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // naive non-equi overlap join — the binned plan must reproduce it
    "q75_interval_overlap" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id,
        |    epoch_us(ts) AS cs, epoch_us(ts) + 300000000 AS ce
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) - 1800000000 AS ps, epoch_us(ts) AS pe
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id AS user_id, click_id, purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id AND cs <= pe AND ps <= ce
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    // composes the q42 repetition rule, q15 langid agreement, and the q62
    // per-lang exact p25 length gate into one per-doc verdict
    "q76_curation_gate" -> s"$curationGateSql\nORDER BY doc_id",
    "q77_quality_deciles" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(NTILE(10) OVER (PARTITION BY lang
        |    ORDER BY length(text), doc_id) AS BIGINT) AS decile
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q78_cdc_chunks" ->
      s"""WITH $cdcChunksSqlCte
         |SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sp) - 1 AS BIGINT)
         |    AS chunk_idx,
         |  CAST(sp AS BIGINT) AS start_pos,
         |  CAST(ep - sp + 1 AS BIGINT) AS n_tokens,
         |  $cdcChunkHashSql AS chunk_hash
         |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    "q79_chunk_dedup" ->
      s"""WITH $cdcChunksSqlCte,
         |ch AS (
         |  SELECT doc_id, CAST(ep - sp + 1 AS BIGINT) AS n_tokens,
         |    $cdcChunkHashSql AS chunk_hash
         |  FROM chunks)
         |SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS keep_doc
         |FROM ch GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,
    "q80_zorder_layout" -> {
      val z = graft.operators.Layout.zValue2Sql("l_suppkey", "l_partkey", 16)
      s"""WITH z AS (
         |  SELECT l_suppkey, l_partkey, $z AS zv FROM lineitem)
         |SELECT CAST(zv >> 16 AS BIGINT) AS zbucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
         |  CAST(MAX(l_suppkey) AS BIGINT) AS max_supp,
         |  CAST(MIN(l_partkey) AS BIGINT) AS min_part,
         |  CAST(MAX(l_partkey) AS BIGINT) AS max_part
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
    },
    "q83_join_size" ->
      """WITH c AS (
        |  SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem
        |  WHERE l_partkey IS NOT NULL GROUP BY 1),
        |p AS (
        |  SELECT CAST(a.k AS VARCHAR) AS k, a.n * b.n AS p
        |  FROM c a JOIN c b ON a.k = b.k),
        |rk AS (
        |  SELECT k, p, row_number() OVER (ORDER BY p DESC, k) AS r FROM p),
        |top AS (
        |  SELECT COALESCE(string_agg(k || ':' || p, '|' ORDER BY r), '') AS top_keys
        |  FROM rk WHERE r <= 5)
        |SELECT agg.total_pairs, agg.matched_keys, agg.max_key_pairs, top.top_keys
        |FROM (SELECT COALESCE(CAST(SUM(p) AS BIGINT), 0) AS total_pairs,
        |             CAST(COUNT(*) AS BIGINT) AS matched_keys,
        |             COALESCE(CAST(MAX(p) AS BIGINT), 0) AS max_key_pairs
        |      FROM p) agg CROSS JOIN top""".stripMargin,
    "q82_profile_cat" ->
      """WITH s AS (
        |  SELECT 'lang' AS col_name, lang AS value FROM documents
        |  UNION ALL
        |  SELECT 'source' AS col_name, source AS value FROM documents),
        |c AS (
        |  SELECT col_name, value, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
        |summ AS (
        |  SELECT col_name,
        |    CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(cnt) FILTER (value IS NULL), 0) AS BIGINT) AS n_null,
        |    CAST(COUNT(*) FILTER (value IS NOT NULL) AS BIGINT) AS n_distinct
        |  FROM c GROUP BY 1),
        |rk AS (
        |  SELECT col_name, value, cnt,
        |    row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, value) AS r
        |  FROM c WHERE value IS NOT NULL),
        |top AS (
        |  SELECT col_name,
        |    string_agg(value || ':' || cnt, '|' ORDER BY r) AS top_values
        |  FROM rk WHERE r <= 5 GROUP BY 1)
        |SELECT summ.col_name, n, n_null, n_distinct, top_values
        |FROM summ LEFT JOIN top ON summ.col_name = top.col_name
        |ORDER BY summ.col_name""".stripMargin,
    "q81_gram_matrix" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |q AS (
        |  SELECT CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS BIGINT))
        |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS v
        |  FROM e)
        |SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
        |  CAST(SUM(v[i + 1] * v[j + 1]) AS BIGINT) AS g
        |FROM q, range(64) r1(i), range(64) r2(j)
        |WHERE i <= j
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,
    "q48_quantized_knn" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x))) AS ma
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN ma > 0 THEN list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / CAST(ma AS DOUBLE)) + 0.5)
        |           AS DOUBLE))
        |    ELSE list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) END AS v
        |  FROM e),
        |scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.v, b.v)
        |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        |      AS cos
        |  FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
        |      AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q51_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${graft.operators.Sampling.stratifiedSampleSql("doc_id", "lang",
              stratifiedRates)}
         |ORDER BY doc_id""".stripMargin,
    "q52_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts AS click_ts,
        |    arg_max(event_id, event_id) AS click_id,
        |    arg_max(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  c.click_id, epoch_us(c.click_ts) AS click_ts_us, c.click_value
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "q84_asof_forward" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |errors AS (
        |  SELECT user_id, ts AS err_ts,
        |    arg_max(event_id, event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  e.err_id, epoch_us(e.err_ts) AS err_ts_us,
        |  epoch_us(e.err_ts) - epoch_us(p.ts) AS us_to_error
        |FROM purchases p ASOF LEFT JOIN errors e
        |  ON p.user_id = e.user_id AND p.ts <= e.err_ts
        |ORDER BY p.event_id""".stripMargin,
    "q53_range_join" ->
      """WITH edays AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE event_type = 'error'),
        |lagged AS (
        |  SELECT user_id, d, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd
        |  FROM edays),
        |grp AS (
        |  SELECT user_id, d,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged),
        |eps AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '1970-01-01', MIN(d)) AS ep_start,
        |    date_diff('day', DATE '1970-01-01', MAX(d)) AS ep_end,
        |    CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM grp GROUP BY user_id, g),
        |purchases AS (
        |  SELECT event_id, user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS p_day
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.p_day, e.ep_start, e.ep_end, e.episode_days
        |FROM purchases p JOIN eps e
        |  ON p.user_id = e.user_id AND p.p_day BETWEEN e.ep_start AND e.ep_end
        |ORDER BY p.user_id, p.event_id, e.ep_start""".stripMargin,
    "q54_sessionize" -> sessionOracleSql,
    // same sessions by construction: the ordered-batch fold telescopes
    // to the one-shot table (q96/q90 proof shape)
    "q112_sessionize_inc" -> sessionOracleSql,
    "q55_scd2_intervals" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS t, MAX(event_type) AS status
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, t, status,
        |    LAG(status) OVER (PARTITION BY user_id ORDER BY t) AS ps
        |  FROM c),
        |ch AS (SELECT user_id, t, status FROM l WHERE ps IS NULL OR ps <> status),
        |iv AS (
        |  SELECT user_id, status, t AS valid_from_us,
        |    LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS valid_to_us
        |  FROM ch)
        |SELECT user_id, status, valid_from_us, valid_to_us,
        |  (valid_to_us IS NULL) AS is_current
        |FROM iv ORDER BY user_id, valid_from_us""".stripMargin,
    "q56_bm25_topk" -> {
      val vals = bm25Queries
        .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }.mkString(", ")
      val inList = bm25Queries.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
      s"""WITH q(query_id, term) AS (VALUES $vals),
         |base AS (
         |  SELECT id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
         |  FROM (SELECT doc_id AS id,
         |          string_split_regex(trim(lower(text)), '\\s+') AS tk
         |        FROM documents)),
         |tfq AS (
         |  SELECT id, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
         |  FROM base WHERE term IN ($inList) GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfq GROUP BY 1),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         |    AVG(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE))
         |      AS avgdl
         |  FROM documents),
         |scored AS (
         |  SELECT q.query_id, tfq.id,
         |    CAST(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0) * tfq.tf * 2.2
         |      / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfq.dl / s.avgdl))
         |      AS DECIMAL(38,12)) AS sc
         |  FROM tfq JOIN q ON q.term = tfq.term
         |  JOIN dfc d ON d.term = tfq.term, stats s),
         |agg AS (SELECT query_id, id, SUM(sc) AS score FROM scored GROUP BY 1, 2)
         |SELECT query_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id)
         |    AS BIGINT) AS rank,
         |  id AS doc_id
         |FROM agg
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin
    },
    "q57_profile" -> {
      val perCol = profileCols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_value,
           |  CAST(MAX($c) AS DOUBLE) AS max_value,
           |  median($c) AS median
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"$perCol\nORDER BY col_name"
    },
    "q58_vocab" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t
        |  GROUP BY term HAVING COUNT(*) >= 5
        |  ORDER BY n DESC, term LIMIT 100)
        |SELECT term, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS vocab_id
        |FROM c ORDER BY vocab_id""".stripMargin,
    "q59_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS l
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS ngram
        |  FROM toks, unnest(generate_series(1, len(l) - 2)) AS u(i)
        |  WHERE len(l) >= 3),
        |tg AS (SELECT doc_id AS test_id, ngram FROM grams WHERE doc_id % 101 = 0),
        |totals AS (SELECT test_id, CAST(COUNT(*) AS BIGINT) AS test_total FROM tg GROUP BY 1),
        |hits AS (
        |  SELECT g.doc_id, t.test_id, CAST(COUNT(*) AS BIGINT) AS matched
        |  FROM grams g JOIN tg t USING (ngram) GROUP BY 1, 2)
        |SELECT doc_id, test_id, matched, test_total,
        |  CAST(matched AS DOUBLE) / test_total AS overlap_frac
        |FROM hits JOIN totals USING (test_id)
        |WHERE CAST(matched AS DOUBLE) / test_total >= CAST(0.5 AS DOUBLE)
        |ORDER BY doc_id, test_id""".stripMargin,
    "q60_incremental_dedup" -> incrementalDedupOracleSql,
    "q65_incremental_exact" ->
      """WITH f AS (
        |  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |bg AS (
        |  SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(MIN(doc_id) AS BIGINT) AS keep_id
        |  FROM f WHERE doc_id % 10 = 0 GROUP BY fp)
        |SELECT fp, n_docs, keep_id FROM bg
        |WHERE fp NOT IN (SELECT fp FROM f WHERE doc_id % 10 <> 0)
        |ORDER BY fp""".stripMargin,
    // alternation branches have disjoint first-char classes, so Java's
    // leftmost-first and RE2's leftmost-longest pick identical tokens
    "q66_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS DOUBLE)
         |    / len(regexp_split_to_array(trim(text), '\\s+')) AS ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q64_per_key_sample" ->
      """SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    // replays Mixing's integer rate arithmetic verbatim: budget = total//2,
    // uniform weight = 1e6 // n_sources, rate = min(1e6, (budget*w // 1e6)
    // * 1e6 // tokens) — floor divisions only, HUGEINT-safe
    "q63_domain_mix" -> {
      val md5 = graft.functions.PortableHash.md5Hash60Sql("doc_id")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS t
         |  FROM documents),
         |tot AS (SELECT source, CAST(SUM(t) AS BIGINT) AS st FROM d GROUP BY 1),
         |g AS (SELECT CAST(SUM(st) // 2 AS BIGINT) AS budget,
         |        CAST(1000000 // COUNT(*) AS BIGINT) AS w FROM tot),
         |r AS (SELECT source,
         |        CAST(LEAST(1000000, ((g.budget * g.w // 1000000) * 1000000)
         |          // greatest(st, 1)) AS BIGINT) AS rate_ppm
         |      FROM tot, g),
         |kept AS (
         |  SELECT d.source, r.rate_ppm, d.t FROM d JOIN r USING (source)
         |  WHERE ($md5 % 1000000) < r.rate_ppm)
         |SELECT source, rate_ppm, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(t) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY 1, 2 ORDER BY source""".stripMargin
    },
    "q62_quality_gate" ->
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents),
        |th AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25 FROM d GROUP BY lang)
        |SELECT d.lang, th.p25,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_kept
        |FROM d JOIN th USING (lang)
        |WHERE n_chars >= p25
        |GROUP BY 1, 2 ORDER BY lang""".stripMargin,
    "q61_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phone = "\\b555-[0-9]{4}\\b"
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN
         |      text || ' contact agent' || CAST(doc_id AS VARCHAR)
         |        || '@corp.example.com call 555-'
         |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |        || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |        || '.' || CAST(doc_id % 100 AS VARCHAR)
         |    ELSE text END AS tt
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, tt,
         |    regexp_replace(regexp_replace(regexp_replace(tt,
         |      '$email', '<EMAIL>', 'g'),
         |      '$ip', '<IP>', 'g'),
         |      '$phone', '<PHONE>', 'g') AS clean
         |  FROM t)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(tt, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(tt, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(tt, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(length(clean) AS BIGINT) AS clean_len,
         |  md5(clean) AS clean_fp
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q49_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk,
        |    CAST(greatest(ceil(CAST(len(tk) - 16 AS DOUBLE) / 48), 1) AS INT) AS nc
        |  FROM d)
        |SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |  array_to_string(tk[u.i * 48 + 1 : u.i * 48 + 64], ' ') AS chunk_text,
        |  CAST(least(len(tk) - u.i * 48, 64) AS INT) AS n_tokens
        |FROM c, unnest(range(nc)) AS u(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q50_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS bin,
        |  CAST(cum - n_tokens
        |    - CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) * 2048
        |    AS BIGINT) AS bin_offset
        |FROM c ORDER BY lang, doc_id""".stripMargin,
    "q45_sector_baseline_rows" ->
      """WITH daily AS (
        |  SELECT o_custkey AS eid, CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |dim AS (SELECT c_custkey AS id, c_mktsegment AS sector FROM customer),
        |base AS (SELECT * FROM daily JOIN dim ON id = eid WHERE sector = 'BUILDING'),
        |mx AS (SELECT max(d) AS end_d FROM base),
        |win AS (SELECT base.*, end_d FROM base, mx WHERE d BETWEEN end_d - 29 AND end_d)
        |SELECT eid AS entity_id, max(sector) AS sector,
        |  CAST(SUM(n) AS DOUBLE) AS window_value,
        |  AVG(n) AS avg_daily_value,
        |  CAST(MAX(CASE WHEN d = end_d THEN n END) AS DOUBLE) AS latest_value,
        |  CAST(MAX(n) AS DOUBLE) AS peak_value,
        |  CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT) AS signal_days
        |FROM win GROUP BY eid ORDER BY entity_id""".stripMargin,
    "q46_crisis_patterns" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |mx AS (SELECT max(d) AS end_d FROM daily),
        |norm AS (
        |  SELECT d AS dt, CAST(user_id AS VARCHAR) AS eid,
        |    'user_' || CAST(user_id AS VARCHAR) AS ename,
        |    event_type AS tag, lower(event_type) AS tag_key, n AS neg,
        |    CASE WHEN event_type IN ('click', 'view') THEN 'crisis'
        |         WHEN event_type = 'error' THEN 'crisis'
        |         ELSE 'odd_label' END AS grp
        |  FROM daily),
        |ed AS (SELECT DISTINCT tag_key, grp, eid, dt FROM norm),
        |isl AS (
        |  SELECT *, CASE WHEN lag(dt) OVER w IS NULL
        |      OR dt - lag(dt) OVER w > 1 THEN 1 ELSE 0 END AS brk
        |  FROM ed WINDOW w AS (PARTITION BY tag_key, grp, eid ORDER BY dt)),
        |isl2 AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY tag_key, grp, eid ORDER BY dt
        |    ROWS UNBOUNDED PRECEDING) AS island FROM isl),
        |epi AS (
        |  SELECT tag_key, grp, eid, island, CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM isl2 GROUP BY 1, 2, 3, 4),
        |dur AS (
        |  SELECT tag_key, grp, CAST(COUNT(*) AS BIGINT) AS episode_count,
        |    quantile_cont(episode_days, 0.5) AS median_duration_days,
        |    CAST(MAX(episode_days) AS BIGINT) AS max_duration_days
        |  FROM epi GROUP BY 1, 2),
        |ra AS (
        |  SELECT tag_key, grp, max(tag) AS tag,
        |    CAST(COUNT(DISTINCT eid) AS BIGINT) AS brands_affected,
        |    CAST(COUNT(DISTINCT CASE WHEN dt = (SELECT end_d FROM mx) THEN eid END)
        |      AS BIGINT) AS active_entities_latest,
        |    CAST(SUM(neg) AS BIGINT) AS total_negative_items
        |  FROM norm GROUP BY 1, 2),
        |pe AS (
        |  SELECT tag_key, grp, eid, SUM(neg) AS etotal, max(ename) AS ename
        |  FROM norm GROUP BY 1, 2, 3),
        |pr AS (
        |  SELECT *, row_number() OVER (PARTITION BY tag_key, grp
        |    ORDER BY etotal DESC, lower(ename)) AS r FROM pe),
        |samples AS (
        |  SELECT tag_key, grp, string_agg(ename, '|' ORDER BY r) AS sample_entities
        |  FROM pr WHERE r <= 3 GROUP BY 1, 2)
        |SELECT ra.tag, CASE WHEN ra.grp = '' THEN NULL ELSE ra.grp END AS "group",
        |  ra.grp = 'crisis' AS is_crisis, ra.brands_affected, dur.episode_count,
        |  dur.median_duration_days, dur.max_duration_days,
        |  ra.active_entities_latest, ra.total_negative_items, samples.sample_entities
        |FROM ra
        |JOIN dur ON dur.tag_key = ra.tag_key AND dur.grp = ra.grp
        |JOIN samples ON samples.tag_key = ra.tag_key AND samples.grp = ra.grp
        |ORDER BY ra.brands_affected DESC, dur.episode_count DESC,
        |  ra.total_negative_items DESC, lower(ra.tag)
        |LIMIT 10""".stripMargin,
    // difflib.SequenceMatcher.ratio() in pure single-statement SQL: the
    // recursive CTE mirrors get_matching_blocks' divide-and-conquer — each
    // live (a-range, b-range) segment finds its longest common substring
    // (ties: smallest i then smallest j, find_longest_match's scan order;
    // autojunk never fires under 200 chars) via a bounded position/length
    // cross-product, then splits into left/right remainder segments plus a
    // dead row carrying the matched length; ratio = 2*sum(m)/(|a|+|b|).
    // Validated char-for-char against CPython difflib over every pair.
    "q31_fuzzy_resolve" ->
      """WITH RECURSIVE
        |dim AS (SELECT n_name FROM nation),
        |q AS (
        |  SELECT DISTINCT lower(substring(n_name, 1, length(n_name) - 1)) AS q
        |  FROM nation),
        |pairs AS (
        |  SELECT q.q, d.n_name, q.q AS a, lower(d.n_name) AS b,
        |    row_number() OVER (ORDER BY q.q, d.n_name) AS pid
        |  FROM q, dim d),
        |gs AS (
        |  SELECT unnest(generate_series(1, (SELECT MAX(length(n_name)) FROM nation))) AS x),
        |seg AS (
        |  SELECT pid, a, b, 1 AS alo, length(a) AS ahi, 1 AS blo, length(b) AS bhi, 0 AS m
        |  FROM pairs
        |  UNION ALL
        |  SELECT f.pid, f.a, f.b,
        |    CASE c.kind WHEN 1 THEN f.alo WHEN 2 THEN f.bi + f.bk ELSE 1 END AS alo,
        |    CASE c.kind WHEN 1 THEN f.bi - 1 WHEN 2 THEN f.ahi ELSE 0 END AS ahi,
        |    CASE c.kind WHEN 1 THEN f.blo WHEN 2 THEN f.bj + f.bk ELSE 1 END AS blo,
        |    CASE c.kind WHEN 1 THEN f.bj - 1 WHEN 2 THEN f.bhi ELSE 0 END AS bhi,
        |    CASE c.kind WHEN 3 THEN f.bk ELSE 0 END AS m
        |  FROM (
        |    SELECT s.pid, s.a, s.b, s.alo, s.ahi, s.blo, s.bhi,
        |           best.i AS bi, best.j AS bj, best.k AS bk
        |    FROM seg s, LATERAL (
        |      SELECT i.x AS i, j.x AS j, k.x AS k
        |      FROM gs i, gs j, gs k
        |      WHERE i.x BETWEEN s.alo AND s.ahi AND j.x BETWEEN s.blo AND s.bhi
        |        AND i.x + k.x - 1 <= s.ahi AND j.x + k.x - 1 <= s.bhi
        |        AND substring(s.a, i.x, k.x) = substring(s.b, j.x, k.x)
        |      ORDER BY k.x DESC, i.x, j.x
        |      LIMIT 1) best
        |    WHERE s.m = 0 AND s.alo <= s.ahi AND s.blo <= s.bhi
        |  ) f, (VALUES (1), (2), (3)) c(kind)),
        |msum AS (SELECT pid, SUM(m) AS mm FROM seg GROUP BY pid),
        |ratio AS (
        |  SELECT p.q, p.n_name,
        |    2.0 * COALESCE(ms.mm, 0) / (length(p.a) + length(p.b)) AS score
        |  FROM pairs p LEFT JOIN msum ms ON ms.pid = p.pid),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, n_name) AS rnk
        |  FROM ratio)
        |SELECT q,
        |  MAX(CASE WHEN rnk = 1 THEN n_name END) AS resolved,
        |  MAX(CASE WHEN rnk = 1 THEN score END) AS score,
        |  MAX(CASE WHEN rnk = 2 THEN score END) AS runner_up,
        |  (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.82 AS DOUBLE) AND
        |   (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.99 AS DOUBLE) OR
        |    COALESCE(MAX(CASE WHEN rnk = 2 THEN score END), CAST(0.0 AS DOUBLE))
        |      < MAX(CASE WHEN rnk = 1 THEN score END) - CAST(0.02 AS DOUBLE)))
        |    AS accepted
        |FROM r WHERE rnk <= 2 GROUP BY q ORDER BY q""".stripMargin,
    "q44_fuzzy_resolve_lev" ->
      """WITH dim AS (SELECT n_name FROM nation),
        |q AS (
        |  SELECT DISTINCT lower(substring(n_name, 1, length(n_name) - 1)) AS q
        |  FROM nation),
        |scored AS (
        |  SELECT q.q, d.n_name,
        |    CAST(1.0 AS DOUBLE) - CAST(levenshtein(q.q, lower(d.n_name)) AS DOUBLE)
        |      / CAST(greatest(length(q.q), length(d.n_name)) AS DOUBLE) AS score
        |  FROM q, dim d),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, n_name) AS rnk
        |  FROM scored)
        |SELECT q,
        |  MAX(CASE WHEN rnk = 1 THEN n_name END) AS resolved,
        |  MAX(CASE WHEN rnk = 1 THEN score END) AS score,
        |  MAX(CASE WHEN rnk = 2 THEN score END) AS runner_up,
        |  (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.82 AS DOUBLE) AND
        |   (MAX(CASE WHEN rnk = 1 THEN score END) >= CAST(0.99 AS DOUBLE) OR
        |    COALESCE(MAX(CASE WHEN rnk = 2 THEN score END), CAST(0.0 AS DOUBLE))
        |      < MAX(CASE WHEN rnk = 1 THEN score END) - CAST(0.02 AS DOUBLE)))
        |    AS accepted
        |FROM r WHERE rnk <= 2 GROUP BY q ORDER BY q""".stripMargin,
    "q01_pricing_pivot" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(COUNT(*) AS BIGINT) AS count_order,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_discount_count,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS order_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q03_effective_status" ->
      """WITH latest AS (
        |  SELECT o_custkey, o_orderstatus,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT c_custkey, c_mktsegment, l.o_orderstatus AS latest_status,
        |  COALESCE(l.o_orderstatus, c_mktsegment) AS eff_status
        |FROM customer c LEFT JOIN (SELECT * FROM latest WHERE rn = 1) l
        |  ON c.c_custkey = l.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q04_union_daily" ->
      """WITH tagged AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE) AS d, 'ship' AS src FROM lineitem)
        |SELECT d,
        |  CAST(SUM(CASE WHEN src = 'orders' THEN 1 ELSE 0 END) AS BIGINT) AS orders_cnt,
        |  CAST(SUM(CASE WHEN src = 'ship' THEN 1 ELSE 0 END) AS BIGINT) AS ship_cnt,
        |  CAST(COUNT(*) AS BIGINT) AS total_cnt
        |FROM tagged GROUP BY d ORDER BY d""".stripMargin,
    "q05_trailing7" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, d,
        |  CAST(SUM(n) OVER w AS BIGINT) AS n7,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS v7,
        |  MIN(d) OVER w AS win_start
        |FROM daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, d""".stripMargin,
    "q06_anomaly_baseline" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT user_id, d, n,
        |    COUNT(*) OVER w AS prior_days,
        |    SUM(n) OVER w AS prior_total
        |  FROM daily
        |  WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, d, CAST(n AS BIGINT) AS n,
        |  CAST(prior_days AS BIGINT) AS prior_days,
        |  CAST(prior_total AS DOUBLE) / prior_days AS baseline
        |FROM scored
        |WHERE prior_days >= 7 AND n >= 2.0 * (CAST(prior_total AS DOUBLE) / prior_days)
        |ORDER BY user_id, d""".stripMargin,
    "q07_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |lagged AS (
        |  SELECT user_id, d, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM days),
        |grp AS (
        |  SELECT user_id, d,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged)
        |SELECT user_id, MIN(d) AS episode_start, MAX(d) AS episode_end,
        |  CAST(COUNT(*) AS BIGINT) AS episode_days
        |FROM grp GROUP BY user_id, g ORDER BY user_id, episode_start""".stripMargin,
    "q08_latest_dedup" ->
      """SELECT user_id, event_type, event_id, CAST(ts AS DATE) AS d, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q09_top3_names" ->
      """SELECT p_brand,
        |  array_to_string(list_sort(array_agg(p_name) FILTER (WHERE p_size > 25))[1:3], ' | ') AS top_names,
        |  CAST(COUNT(*) FILTER (WHERE p_size > 25) AS BIGINT) AS n_large
        |FROM part GROUP BY p_brand
        |HAVING COUNT(*) FILTER (WHERE p_size > 25) > 0
        |ORDER BY p_brand""".stripMargin,
    "q10_screen_top_spenders" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS peak_order,
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS big_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >= 100000
        |ORDER BY total_spend DESC, o_custkey LIMIT 20""".stripMargin,
    "q11_median_price" ->
      """SELECT o_orderpriority, median(o_totalprice) AS median_price,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q12_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |        ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn > 100 AND rn <= 150 ORDER BY rn""".stripMargin,
    "q13_token_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars2,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\s+')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q14_doc_fingerprint" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q15_lang_id" -> s"$langIdSql\nORDER BY doc_id",
    "q39_lang_confusion" ->
      s"""WITH pred AS ($langIdSql),
         |counts AS (
         |  SELECT lang AS expected, predicted_lang AS predicted,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM pred GROUP BY 1, 2),
         |totals AS (
         |  SELECT expected, CAST(SUM(n) AS BIGINT) AS class_total
         |  FROM counts GROUP BY 1)
         |SELECT c.expected, c.predicted, c.n, t.class_total,
         |  CAST(c.n AS DOUBLE) / t.class_total AS class_share
         |FROM counts c JOIN totals t ON c.expected = t.expected
         |ORDER BY c.expected, c.predicted""".stripMargin,
    "q20_active_propagation" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |flags AS (SELECT user_id, d, n, n >= 5 AS s, n >= 3 AS c FROM daily),
        |isl AS (
        |  SELECT *, SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS island
        |  FROM (SELECT *, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM flags)),
        |seg AS (
        |  SELECT *, SUM(CASE WHEN c THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY user_id, island ORDER BY d ROWS UNBOUNDED PRECEDING) AS segment
        |  FROM isl),
        |act AS (
        |  SELECT *, MAX(CASE WHEN s THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id, island, segment ORDER BY d ROWS UNBOUNDED PRECEDING) = 1 AS chain_s
        |  FROM seg)
        |SELECT user_id, d, CAST(n AS BIGINT) AS n, (s OR (c AND chain_s)) AS active
        |FROM act ORDER BY user_id, d""".stripMargin,
    "q21_trailing_streak" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, d, n,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d DESC) AS rn
        |      FROM daily)
        |SELECT user_id,
        |  CAST(COALESCE(MIN(CASE WHEN n < 3 THEN rn END) - 1, COUNT(*)) AS BIGINT) AS streak_days
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q22_lag_delta" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT a.user_id, a.d, CAST(a.n AS BIGINT) AS n, CAST(b.n AS BIGINT) AS prior_n,
        |  CAST(a.n - b.n AS BIGINT) AS delta,
        |  CAST(a.n AS DOUBLE) / b.n AS ratio
        |FROM daily a JOIN daily b
        |  ON a.user_id = b.user_id AND b.d = a.d - 1
        |ORDER BY a.user_id, a.d""".stripMargin,
    "q23_anchored_weekly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |latest AS (SELECT user_id, MAX(d) AS l FROM daily GROUP BY 1),
        |anchors AS (
        |  SELECT user_id, l - CAST(7 * k AS INTEGER) AS anchor
        |  FROM latest, (SELECT unnest(range(4)) AS k))
        |SELECT a.user_id, a.anchor, CAST(COALESCE(SUM(dd.n), 0) AS BIGINT) AS n7
        |FROM anchors a LEFT JOIN daily dd
        |  ON dd.user_id = a.user_id AND dd.d BETWEEN a.anchor - 6 AND a.anchor
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q24_pipe_series" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT user_id,
        |    string_agg(CAST(v AS VARCHAR), '|' ORDER BY d) AS vh,
        |    string_agg(CAST(d AS VARCHAR), '|' ORDER BY d) AS dh
        |  FROM daily GROUP BY user_id),
        |pct AS (
        |  SELECT *, string_split(vh, '|') AS vl FROM series),
        |pct2 AS (
        |  SELECT user_id, vh, dh,
        |    CASE WHEN len(vl) >= 2 AND CAST(vl[-2] AS DOUBLE) <> 0.0
        |         THEN (CAST(vl[-1] AS DOUBLE) - CAST(vl[-2] AS DOUBLE)) / CAST(vl[-2] AS DOUBLE) * 100.0
        |    END AS daily_change_pct
        |  FROM pct)
        |SELECT user_id, CAST(d_str AS DATE) AS d, CAST(v_str AS DOUBLE) AS v, daily_change_pct
        |FROM (SELECT user_id, daily_change_pct,
        |        unnest(string_split(dh, '|')) AS d_str,
        |        unnest(string_split(vh, '|')) AS v_str
        |      FROM pct2)
        |ORDER BY user_id, d""".stripMargin,
    "q25_semi_join_scope" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_acctbal > 5000)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q26_sector_baseline" ->
      """WITH by_nation AS (
        |  SELECT n_name, n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |    median(c_acctbal) AS median_bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, n_regionkey)
        |SELECT n_name, n_regionkey, n_custs, total_bal, median_bal,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  PERCENT_RANK() OVER w AS pct_rank
        |FROM by_nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY total_bal DESC, n_name)
        |ORDER BY n_regionkey, rnk""".stripMargin,
    "q27_index_rollup" ->
      """SELECT CAST(ts AS DATE) AS d, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q28_topk_composite" ->
      """SELECT p_partkey, p_name, p_retailprice
        |FROM part
        |ORDER BY p_retailprice DESC, lower(p_name), p_partkey
        |LIMIT 10""".stripMargin,
    "q34_signal_score" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_cnt,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_cnt,
        |  SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * CAST(0.24 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * CAST(0.16 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * CAST(0.12 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * CAST(0.10 AS DOUBLE)
        |    + SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * CAST(0.24 AS DOUBLE) AS signal_score
        |FROM events GROUP BY user_id
        |ORDER BY signal_score DESC, user_id LIMIT 50""".stripMargin,
    "q35_distinct_users" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q37_evidence_histogram" ->
      """SELECT event_type,
        |  CASE WHEN value >= 100 THEN 'high' WHEN value >= 30 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "q38_storyline_scores" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |lagged AS (
        |  SELECT user_id, d, n, LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS pd FROM daily),
        |grp AS (
        |  SELECT user_id, d, n,
        |    SUM(CASE WHEN pd IS NULL OR date_diff('day', pd, d) > 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS g
        |  FROM lagged),
        |episodes AS (
        |  SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS episode_days
        |  FROM grp GROUP BY user_id, g),
        |per_bucket AS (
        |  SELECT user_id % 5 AS bucket,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS affected,
        |    CAST(SUM(n) AS BIGINT) AS items
        |  FROM daily GROUP BY 1),
        |bucket_dur AS (
        |  SELECT user_id % 5 AS bucket,
        |    CAST(SUM(episode_days) AS DOUBLE) / COUNT(*) AS avg_dur,
        |    CAST(SUM(episode_days) AS BIGINT) AS active_days
        |  FROM episodes GROUP BY 1)
        |SELECT b.bucket, b.affected, b.items, d.avg_dur, d.active_days,
        |  b.affected * CAST(6.0 AS DOUBLE) + b.items * CAST(0.35 AS DOUBLE)
        |    + d.avg_dur * CAST(2.0 AS DOUBLE) + d.active_days * CAST(0.4 AS DOUBLE) AS score
        |FROM per_bucket b JOIN bucket_dur d ON b.bucket = d.bucket
        |ORDER BY score DESC, b.bucket""".stripMargin,
    // cosine similarity itself is excluded from both projections: DuckDB's
    // list_cosine_similarity on FLOAT[] accumulates in float (~1e-7 off our
    // double); rankings still agree because measured adjacent-rank margins
    // are >= 1e-5 at sf0.01/sf0.1 (see cosineKnn scaladoc).
    "q16_cosine_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.qid, c.vec_id AS nid,
        |         list_cosine_similarity(q.qv, c.embedding) AS cos
        |  FROM q JOIN embeddings c ON c.vec_id <> q.qid)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT qid AS query_id, nid AS neighbor_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
        |  FROM pairs) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q17_cosine_ivf" -> cosineIvfOracleSql,
    "q29_narrative_rollup" -> narrativeOracleSql,
    "q42_repetition_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
        |uni AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
        |    CAST(MAX(c) AS BIGINT) AS top_token_count
        |  FROM tc GROUP BY 1),
        |d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |      FROM documents),
        |bg0 AS (
        |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
        |  FROM d, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)
        |  WHERE len(w) >= 2
        |  UNION ALL
        |  SELECT doc_id, array_to_string(w, ' ') FROM d WHERE len(w) < 2),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY 1, 2),
        |bi AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |    CAST(MAX(c) AS BIGINT) AS top_bigram_count
        |  FROM bc GROUP BY 1)
        |SELECT doc_id, n_tokens, distinct_tokens, top_token_count,
        |  n_bigrams, top_bigram_count,
        |  CAST(distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio,
        |  CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac,
        |  CAST(top_bigram_count AS DOUBLE) / n_bigrams AS top_bigram_frac,
        |  (CAST(top_token_count AS DOUBLE) / n_tokens > CAST(0.1 AS DOUBLE)
        |    OR CAST(top_bigram_count AS DOUBLE) / n_bigrams > CAST(0.05 AS DOUBLE))
        |    AS repetitive
        |FROM uni JOIN bi USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q30_control_classify" -> controlOracleSql,
    // Image rows are a REAL PNG encode->ImageIO.read round-trip; the pixel
    // law gray = (id*31 + x*7 + y*13) % 256 is integer-exact, so the oracle
    // replays the decoded checksum without ever touching the codec. Audio/
    // video rows are opaque stand-ins (no codec) -> decode_ok false.
    "q32_multimodal_decode" ->
      s"""WITH img AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 32 + 1 AS INTEGER) AS w,
        |    CAST(doc_id % 24 + 1 AS INTEGER) AS h,
        |    ${pixelBlockCols("doc_id")}
        |  FROM documents WHERE doc_id % 3 = 0),
        |px AS (
        |  SELECT doc_id,
        |    CAST(sum((doc_id * 31 + xs.x * cx + ys.y * 13 + ph) % 256)
        |      AS BIGINT) AS gray_sum
        |  FROM img,
        |    unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS xs(x),
        |    unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS ys(y)
        |  GROUP BY 1)
        |SELECT d.doc_id AS media_id,
        |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
        |       WHEN d.doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  (d.doc_id % 3 = 0) AS decode_ok,
        |  CAST(8 AS INTEGER) AS feature_dim,
        |  img.w AS decoded_width,
        |  img.h AS decoded_height,
        |  px.gray_sum
        |FROM documents d
        |LEFT JOIN img ON d.doc_id = img.doc_id
        |LEFT JOIN px ON d.doc_id = px.doc_id
        |ORDER BY media_id""".stripMargin,
    "q36_random_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
        |LIMIT 100""".stripMargin,
    "q40_jaccard_verify" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE doc_id < 200),
        |sh AS (
        |  SELECT DISTINCT doc_id, lang, s FROM (
        |    SELECT doc_id, lang,
        |      CASE WHEN len(w) < 2 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 1, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(m AS DOUBLE) / (ca.n + cb.n - m) AS jaccard
        |FROM inter
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.08 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    "q41_quality_score" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_nonspace,
         |  CAST(${qHits(Seq("the", "a", "and", "of"))} AS BIGINT) AS stop_hits,
         |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
         |    AS n_digits,
         |  CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')) AS mean_token_len,
         |  CAST(${qHits(Seq("the", "a", "and", "of"))} AS DOUBLE)
         |    / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |    / length(text) AS digit_ratio,
         |  len(string_split_regex(trim(text), '\\s+')) BETWEEN 20 AND 2000
         |    AND ${qHits(Seq("the", "a", "and", "of"))} >= 1 AS quality_ok
         |FROM documents ORDER BY doc_id""".stripMargin,
    // the bloom prune is result-invisible (fpp residue removed by the
    // exact semi join) — the oracle is the PLAIN semi-join aggregate
    "q97_bloom_prune" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // full-outer replay of the snapshot derivation; IS DISTINCT FROM is
    // the null-safe twin of Spark's <=>; concat_ws skips NULLs in both
    // engines, so the changed-column list builds identically
    "q98_table_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |nw AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    o.o_orderkey IS NOT NULL AS in_old, n.o_orderkey IS NOT NULL AS in_new,
        |    o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS d_status,
        |    o.o_totalprice IS DISTINCT FROM n.o_totalprice AS d_price
        |  FROM old o FULL JOIN nw n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT in_old THEN 'added' WHEN NOT in_new THEN 'removed'
        |       WHEN d_status OR d_price THEN 'changed'
        |       ELSE 'unchanged' END AS change,
        |  CASE WHEN in_old AND in_new THEN concat_ws(',',
        |         CASE WHEN d_status THEN 'o_orderstatus' END,
        |         CASE WHEN d_price THEN 'o_totalprice' END)
        |       ELSE '' END AS changed_cols
        |FROM j
        |WHERE NOT (in_old AND in_new AND NOT d_status AND NOT d_price)
        |ORDER BY o_orderkey""".stripMargin,
    // spine replay via generate_series; LAST_VALUE IGNORE NULLS over a
    // ROWS frame is the forward fill in both engines; max() is
    // comparison-only (no float arithmetic), so doubles are bit-stable
    "q99_gap_fill" ->
      """WITH obs AS (
        |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
        |    MAX(o_totalprice) AS mx
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1, 2),
        |span AS (SELECT pri, MIN(d) AS d0, MAX(d) AS d1 FROM obs GROUP BY pri),
        |spine AS (
        |  SELECT pri, CAST(u.g AS DATE) AS d
        |  FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(g)),
        |j AS (
        |  SELECT s.pri, s.d, o.mx, o.pri IS NOT NULL AS present
        |  FROM spine s LEFT JOIN obs o ON s.pri = o.pri AND s.d = o.d)
        |SELECT pri, d, mx,
        |  LAST_VALUE(mx IGNORE NULLS) OVER (PARTITION BY pri ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_filled,
        |  NOT present AS is_gap
        |FROM j
        |ORDER BY pri, d""".stripMargin,
    // quantile_cont is the R-7 interpolation the kernel reproduces
    // bit-for-bit (q57/q62 precedent); fences reuse the same association
    // order (q1 - k*(q3-q1)) so the IEEE doubles match exactly
    "q100_iqr_outliers" ->
      """WITH b AS (
        |  SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT b.event_type, CAST(COUNT(*) AS BIGINT) AS n, b.q1, b.q3,
        |  b.q1 - 1.5 * (b.q3 - b.q1) AS lo,
        |  b.q3 + 1.5 * (b.q3 - b.q1) AS hi,
        |  CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN e.value > b.q3 + 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
        |    OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN b ON e.event_type = b.event_type
        |WHERE e.value IS NOT NULL
        |GROUP BY b.event_type, b.q1, b.q3
        |ORDER BY b.event_type""".stripMargin,
    // downward closure makes the item pre-filter result-invisible at one
    // shared threshold, so the oracle replays the same three stages
    "q101_frequent_pairs" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, p_brand AS i
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |f AS (SELECT i FROM bi GROUP BY i HAVING COUNT(*) >= 350),
        |bf AS (SELECT b, i FROM bi WHERE i IN (SELECT i FROM f)),
        |p AS (
        |  SELECT a.i AS item_a, b2.i AS item_b,
        |    CAST(COUNT(*) AS BIGINT) AS pair_count
        |  FROM bf a JOIN bf b2 ON a.b = b2.b AND a.i < b2.i
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, pair_count FROM p
        |WHERE pair_count >= 350
        |ORDER BY item_a, item_b""".stripMargin,
    "q102_hash_split" -> {
      val b = graft.operators.Splits.bucketSql("doc_id")
      s"""SELECT doc_id, lang, $b AS bucket,
         |  CASE WHEN $b < 800000 THEN 'train'
         |       WHEN $b < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // exact co-moment sums in the cents domain (BIGINT products, HUGEINT
    // sums == Spark's decimal(38,0) sums), then the identical final IEEE
    // sequence — bit-stable where native corr() would drift
    "q103_pearson" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS x,
        |    CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
        |    CAST(SUM(x*y) AS DOUBLE) AS sxy
        |  FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |    THEN (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy))
        |    END AS r,
        |  CASE WHEN n*sxx - sx*sx > 0
        |    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // integer marginals from the cell table; expected/contribution are the
    // same fixed IEEE sequence per cell — no float aggregation to drift
    "q104_contingency" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS observed
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY lang, source),
        |m AS (
        |  SELECT lang, source, observed,
        |    SUM(observed) OVER (PARTITION BY lang) AS row_total,
        |    SUM(observed) OVER (PARTITION BY source) AS col_total,
        |    SUM(observed) OVER () AS n
        |  FROM cells)
        |SELECT lang, source, observed,
        |  CAST(row_total AS BIGINT) AS row_total,
        |  CAST(col_total AS BIGINT) AS col_total,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
        |  (CAST(observed AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(observed AS DOUBLE) - CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(row_total * col_total AS DOUBLE) / CAST(n AS DOUBLE)) AS contribution
        |FROM m ORDER BY lang, source""".stripMargin,
    // q44's normalized-Levenshtein score, replayed through the same
    // prefix-2 blocking both engines compute identically
    "q105_blocked_resolve" ->
      """WITH p AS (
        |  SELECT DISTINCT substring(p_name, 1, length(p_name) - 1) AS q
        |  FROM part WHERE p_name IS NOT NULL),
        |c AS (SELECT DISTINCT p_name AS cand FROM part WHERE p_name IS NOT NULL),
        |pb AS (SELECT q, substring(lower(q), 1, 2) AS bk FROM p),
        |cb AS (SELECT cand, substring(lower(cand), 1, 2) AS bk FROM c),
        |s AS (
        |  SELECT pb.q, cb.cand,
        |    CAST(1.0 AS DOUBLE)
        |      - CAST(levenshtein(lower(pb.q), lower(cb.cand)) AS DOUBLE)
        |        / CAST(greatest(length(pb.q), length(cb.cand)) AS DOUBLE) AS score
        |  FROM pb JOIN cb USING (bk)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q ORDER BY score DESC, cand) AS rnk
        |  FROM s)
        |SELECT q, cand AS resolved, score FROM r
        |WHERE rnk = 1 AND score >= 0.5
        |ORDER BY q""".stripMargin,
    // quantile_cont twice (median, then median of |v − med|); fence
    // arithmetic keeps the kernel's association order (med ± 3·mad) so
    // the IEEE doubles replay exactly (q100 precedent)
    "q106_mad_outliers" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS pri, quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT m.pri, o.o_totalprice AS v, m.med,
        |    ABS(o.o_totalprice - m.med) AS ad
        |  FROM orders o JOIN m ON o.o_orderpriority = m.pri
        |  WHERE o.o_totalprice IS NOT NULL),
        |md AS (SELECT pri, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY pri)
        |SELECT d.pri, CAST(COUNT(*) AS BIGINT) AS n, d.med, md.mad,
        |  d.med - 3.0 * md.mad AS lo, d.med + 3.0 * md.mad AS hi,
        |  CAST(SUM(CASE WHEN d.v < d.med - 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN d.v > d.med + 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CASE WHEN d.v < d.med - 3.0 * md.mad
        |    OR d.v > d.med + 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md ON d.pri = md.pri
        |GROUP BY d.pri, d.med, md.mad
        |ORDER BY d.pri""".stripMargin,
    // lead(id, k) over (partition by block order by sk, id) ≡ self-join
    // on rank distance 1..w−1; q105's score expression on the union of
    // the two passes
    "q107_sorted_neighborhood" ->
      """WITH s1 AS (
        |  SELECT p_partkey AS id, lower(p_name) AS sk,
        |    substring(lower(p_name), 1, 2) AS blk
        |  FROM part WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
        |r1 AS (SELECT id, blk,
        |  row_number() OVER (PARTITION BY blk ORDER BY sk, id) AS rn FROM s1),
        |s2 AS (
        |  SELECT p_partkey AS id, reverse(lower(p_name)) AS sk,
        |    substring(reverse(lower(p_name)), 1, 2) AS blk
        |  FROM part WHERE p_partkey IS NOT NULL AND p_name IS NOT NULL),
        |r2 AS (SELECT id, blk,
        |  row_number() OVER (PARTITION BY blk ORDER BY sk, id) AS rn FROM s2),
        |c AS (
        |  SELECT DISTINCT id_a, id_b FROM (
        |    SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |    FROM r1 a JOIN r1 b
        |      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4
        |    UNION ALL
        |    SELECT least(a.id, b.id), greatest(a.id, b.id)
        |    FROM r2 a JOIN r2 b
        |      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 4)),
        |sc AS (
        |  SELECT c.id_a, c.id_b,
        |    1.0 - CAST(levenshtein(lower(x.p_name), lower(y.p_name)) AS DOUBLE)
        |        / CAST(greatest(length(x.p_name), length(y.p_name)) AS DOUBLE) AS score
        |  FROM c JOIN part x ON c.id_a = x.p_partkey
        |         JOIN part y ON c.id_b = y.p_partkey)
        |SELECT id_a, id_b, score FROM sc WHERE score >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    // a zone scans iff its [min, max] envelope overlaps the predicate
    // interval — all-integer accounting, so the replay is exact
    "q108_zone_map" ->
      """WITH li AS (
        |  SELECT l_orderkey AS k, CAST(l_shipdate AS DATE) AS d
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL),
        |z1 AS (
        |  SELECT CAST((k - k % 1000) / 1000 AS BIGINT) AS z, COUNT(*) AS n,
        |    MIN(d) AS mn, MAX(d) AS mx,
        |    SUM(CASE WHEN d BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |      THEN 1 ELSE 0 END) AS m
        |  FROM li GROUP BY 1),
        |z2 AS (
        |  SELECT date_trunc('month', d) AS z, COUNT(*) AS n,
        |    MIN(d) AS mn, MAX(d) AS mx,
        |    SUM(CASE WHEN d BETWEEN DATE '1997-01-01' AND DATE '1997-03-31'
        |      THEN 1 ELSE 0 END) AS m
        |  FROM li GROUP BY 1),
        |s1 AS (
        |  SELECT 'natural' AS layout, CAST(COUNT(*) AS BIGINT) AS zones_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
        |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS rows_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN n END), 0) AS BIGINT) AS rows_scanned,
        |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched
        |  FROM z1),
        |s2 AS (
        |  SELECT 'by_month' AS layout, CAST(COUNT(*) AS BIGINT) AS zones_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN 1 ELSE 0 END), 0) AS BIGINT) AS zones_scanned,
        |    CAST(COALESCE(SUM(n), 0) AS BIGINT) AS rows_total,
        |    CAST(COALESCE(SUM(CASE WHEN mx >= DATE '1997-01-01'
        |      AND mn <= DATE '1997-03-31' THEN n END), 0) AS BIGINT) AS rows_scanned,
        |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS rows_matched
        |  FROM z2)
        |SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY layout""".stripMargin,
    // all-integer counters; pass = zero violations; anchored regex keeps
    // rlike and regexp_matches agreeing
    "q109_expectations" ->
      """WITH rl AS (
        |  SELECT
        |    CAST(COUNT(*) AS BIGINT) AS nn_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS nn_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS ir_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
        |      AND NOT (o_totalprice BETWEEN 0.0 AND 450000.0) THEN 1 ELSE 0 END), 0) AS BIGINT) AS ir_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS is_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('F', 'O') THEN 1 ELSE 0 END), 0) AS BIGINT) AS is_v,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS re_c,
        |    CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 1 ELSE 0 END), 0) AS BIGINT) AS re_v
        |  FROM orders),
        |uk AS (
        |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v
        |  FROM (SELECT COUNT(*) AS n FROM orders
        |        WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)),
        |uc AS (
        |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS v
        |  FROM (SELECT COUNT(*) AS n FROM orders
        |        WHERE o_custkey IS NOT NULL GROUP BY o_custkey)),
        |fk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS v
        |  FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL)
        |SELECT check_name, n_checked, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'not_null:o_custkey' AS check_name, nn_c AS n_checked, nn_v AS n_violations FROM rl
        |  UNION ALL SELECT 'in_range:o_totalprice', ir_c, ir_v FROM rl
        |  UNION ALL SELECT 'in_set:o_orderstatus', is_c, is_v FROM rl
        |  UNION ALL SELECT 'regex:o_orderpriority', re_c, re_v FROM rl
        |  UNION ALL SELECT 'unique:o_orderkey', c, v FROM uk
        |  UNION ALL SELECT 'unique:o_custkey', c, v FROM uc
        |  UNION ALL SELECT 'fk:l_orderkey', c, v FROM fk)
        |ORDER BY check_name""".stripMargin,
    // lower weighted quantile: smallest v with cumweight >= ceil(p*W) —
    // integer weights, q13's token expression, no interpolation anywhere
    "q110_weighted_quantiles" ->
      """WITH d AS (
        |  SELECT lang, CAST(length(text) AS DOUBLE) AS v,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
        |  FROM documents
        |  WHERE lang IS NOT NULL AND text IS NOT NULL),
        |g AS (SELECT lang, v, SUM(w) AS w FROM d WHERE w > 0 GROUP BY lang, v),
        |c AS (SELECT lang, v, w,
        |  SUM(w) OVER (PARTITION BY lang ORDER BY v) AS cum FROM g),
        |t AS (SELECT lang, SUM(w) AS tw FROM g GROUP BY lang),
        |pr AS (SELECT * FROM (VALUES (0.5), (0.9)) AS p(prob)),
        |tt AS (SELECT t.lang, pr.prob,
        |  CAST(CEIL(pr.prob * t.tw) AS BIGINT) AS tgt, t.tw
        |  FROM t CROSS JOIN pr)
        |SELECT c.lang, tt.prob, MIN(c.v) AS value,
        |  CAST(MAX(tt.tw) AS BIGINT) AS total_weight
        |FROM c JOIN tt ON c.lang = tt.lang AND c.cum >= tt.tgt
        |GROUP BY c.lang, tt.prob
        |ORDER BY c.lang, tt.prob""".stripMargin,
    // cummax sweep: a window opens a merged range iff its start passes
    // the running max of prior ends; ties on (s, e) are order-immune
    "q111_interval_union" ->
      """WITH iv AS (
        |  SELECT l_suppkey AS k,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS s,
        |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) + 6 AS e
        |  FROM lineitem WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL),
        |o AS (
        |  SELECT k, s, e, MAX(e) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |g AS (
        |  SELECT k, s, e, SUM(CASE WHEN pmax IS NULL OR s > pmax
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY k ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
        |  FROM o),
        |u AS (
        |  SELECT k, gid, MIN(s) AS us, MAX(e) AS ue, COUNT(*) AS n
        |  FROM g GROUP BY k, gid)
        |SELECT k AS l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_ranges,
        |  CAST(SUM(n) AS BIGINT) AS n_merged,
        |  CAST(SUM(ue - us + 1) AS BIGINT) AS covered_days
        |FROM u GROUP BY k ORDER BY l_suppkey""".stripMargin,
    // brute-force all-pairs oracle: the gate proves the Spark side's
    // prefix filter is COMPLETE (finds every qualifying pair), since the
    // two sides share only the Jaccard definition, not the algorithm
    "q113_set_similarity" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
        |           ELSE w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] END AS s
        |    FROM d, unnest(generate_series(1, greatest(len(w) - 2, 1))) AS u(i)) t),
        |counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS m
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(m AS DOUBLE) / (ca.n + cb.n - m) AS jaccard
        |FROM inter
        |JOIN counts ca ON ca.doc_id = id_a
        |JOIN counts cb ON cb.doc_id = id_b
        |WHERE CAST(m AS DOUBLE) / (ca.n + cb.n - m) >= CAST(0.5 AS DOUBLE)
        |ORDER BY id_a, id_b""".stripMargin,
    // recursive-CTE replay of the integer EWMA recurrence; DuckDB's `//`
    // truncates toward zero exactly like Java long division (all terms
    // here are non-negative anyway — events.value > 0)
    "q114_ewma_chart" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, CAST(floor(value * 1e6) AS BIGINT) AS v,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS rn
        |  FROM events),
        |rec AS (
        |  SELECT user_id, rn, event_id, v, v AS ewma, CAST(0 AS BIGINT) AS dev,
        |    CAST(NULL AS BIGINT) AS resid, false AS is_spike
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.user_id, ev.rn, ev.event_id, ev.v,
        |    (1 * ev.v + 3 * rec.ewma) // 4,
        |    (1 * abs(ev.v - rec.ewma) + 3 * rec.dev) // 4,
        |    ev.v - rec.ewma,
        |    rec.dev > 0 AND abs(ev.v - rec.ewma) > 3 * rec.dev
        |  FROM ev JOIN rec ON ev.user_id = rec.user_id AND ev.rn = rec.rn + 1)
        |SELECT user_id, rn, event_id, v, ewma, dev, resid, is_spike
        |FROM rec ORDER BY user_id, rn""".stripMargin,
    // brute-force triangle enumeration (a<b<c three-way join) vs the
    // Spark side's degree-ordered orientation — different algorithms,
    // same census
    "q115_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |pairs AS (
        |  SELECT a.p AS pa, b.p AS pb FROM op a JOIN op b
        |  ON a.o = b.o AND a.p < b.p GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (
        |  SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
        |  FROM pairs ab JOIN pairs bc ON ab.pb = bc.pa
        |  JOIN pairs ac ON ac.pa = ab.pa AND ac.pb = bc.pb),
        |nodes AS (SELECT pa AS p FROM pairs UNION ALL SELECT pb FROM pairs),
        |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM nodes GROUP BY 1),
        |tn AS (SELECT p, CAST(count(*) AS BIGINT) AS t FROM (
        |  SELECT a AS p FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT deg.p AS part, deg.d AS degree,
        |  coalesce(tn.t, 0) AS triangles,
        |  CASE WHEN deg.d >= 2
        |    THEN CAST(2 * coalesce(tn.t, 0) AS DOUBLE)
        |      / CAST(deg.d * (deg.d - 1) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS clustering
        |FROM deg LEFT JOIN tn ON tn.p = deg.p
        |ORDER BY part""".stripMargin
  )

  /** standalone-stopword hit total for the quality-score oracle (same
    * length-difference trick as langIdSql). */
  private def qHits(words: Seq[String]): String =
    words.map { w =>
      s"CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ' '))) / ${w.length + 1} AS BIGINT)"
    }.mkString(" + ")

  /** q30 oracle: K11/K12 classification semantics in DuckDB SQL for the
    * synthesized URL shapes (`https://www.<source>.com/page/<id>` and
    * `https://news.example.com/a/<id>`). Expressed at the SEMANTIC level —
    * hostname derivation, company-domain suffix match, brand-token-in-host,
    * finance term/ticker regexes (both RE2-safe), finance source domains —
    * not as a precomputed answer; path-based branches (social post/profile
    * slugs) cannot fire for these paths and are noted, not encoded. */
  private lazy val controlOracleSql: String = {
    import graft.functions.{NarrativeRules => NR, RiskRules => RR}
    val financeList = RR.FinanceSources.toSeq.sorted.map(d => s"'$d'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN doc_id % 2 = 0 THEN lower(source) || '.com'
       |         ELSE 'news.example.com' END AS host
       |  FROM documents),
       |cls AS (
       |  SELECT source,
       |    -- classify_control: publisher null; paths /page/<id> and /a/<id>
       |    -- can never hit the social post/profile/path-keyword branches,
       |    -- so control reduces to company-domain match + brand-token-in-host
       |    (host = lower(source) || '.com'
       |      OR ends_with(host, '.' || lower(source) || '.com')
       |      OR len(list_filter(
       |           string_split(host, '.')[1:-2],
       |           x -> regexp_replace(x, '[^a-z0-9]', '', 'g') =
       |                regexp_replace(lower(source), '[^a-z0-9]', '', 'g')
       |                AND regexp_replace(lower(source), '[^a-z0-9]', '', 'g') <> ''))
       |         > 0) AS controlled,
       |    (regexp_matches(text, '${NR.sqlPattern(RR.FinanceTermsRe)}')
       |      OR regexp_matches(text, '${RR.TickerRe.pattern()}')
       |      OR len(list_filter($financeList,
       |           d -> host = d OR ends_with(host, '.' || d))) > 0) AS finance
       |  FROM t)
       |SELECT source,
       |  CAST(SUM(CASE WHEN controlled THEN 1 ELSE 0 END) AS BIGINT) AS controlled_cnt,
       |  CAST(SUM(CASE WHEN finance THEN 1 ELSE 0 END) AS BIGINT) AS finance_cnt,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM cls GROUP BY source ORDER BY source""".stripMargin
  }

  /** q29 oracle: the FULL narrative kernel (K1/K2/K3) in DuckDB SQL,
    * generated from the same compiled pattern constants the Scala kernel
    * uses ([[graft.functions.NarrativeRules]]) — possible because the whole
    * battery is RE2-compatible. Classification CASE mirrors the battery's
    * fixed decision order; the rollup mirrors NarrativeRollup (gate,
    * histogram tie-break, Other fallback); tags/tag_counts are built as the
    * same JSON strings Spark's to_json emits. */
  private lazy val narrativeOracleSql: String = {
    import graft.functions.{NarrativeRules => NR}
    def re(hay: String, p: java.util.regex.Pattern): String =
      s"regexp_matches($hay, '${NR.sqlPattern(p)}')"
    // classify haystack: Seq(title, snippet, source, url).mkString(" ").trim
    // with snippet = url = '' -> two spaces between title and source
    val hay = "trim(title || '  ' || source)"
    // low-priority haystack filters empty components -> single space
    val lpHay = "trim(title || ' ' || source)"

    val lp = Seq(
      s"(${re(lpHay, NR.LowPriorityTariffContextRe)} AND ${re(lpHay, NR.LowPriorityTariffLegalRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityTariffBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.WorkforceRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityLegalEnforcementRe)})",
      s"(${re(lpHay, NR.LowPriorityDelayActionRe)} AND ${re(lpHay, NR.LowPriorityDelayContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityDelayBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityFeeActionRe)} AND ${re(lpHay, NR.LowPriorityFeeContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityDebtActionRe)} AND ${re(lpHay, NR.LowPriorityDebtContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityDebtBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)})",
      s"(${re(lpHay, NR.LowPriorityStoreActionRe)} AND ${re(lpHay, NR.LowPriorityStoreContextRe)}" +
        s" AND NOT ${re(lpHay, NR.LowPriorityCrisisBlockerRe)} AND NOT ${re(lpHay, NR.LowPriorityLegalEnforcementRe)})"
    ).mkString("(", " OR ", ")")

    // fixed decision order: crisis battery first (first hit is primary),
    // then non-crisis — matches classifyNarrativeTags
    val battery: Seq[(String, String)] = Seq(
      re(hay, NR.FraudRe) -> "Fraud",
      re(hay, NR.DataBreachRe) -> "Data Breaches",
      s"(${re(hay, NR.CeoDepartRe)} AND NOT ${re(hay, NR.CeoDepartExcludeRe)})" ->
        "CEO Departures (firings, resignations)",
      re(hay, NR.WorkforceRe) -> "Workforce Reductions",
      re(hay, NR.LaborRe) -> "Labor Disputes",
      re(hay, NR.AccidentRe) -> "Accidents & Disasters",
      re(hay, NR.ActivistInvestorRe) -> "Activist Investor Interest",
      re(hay, NR.UnforcedRe) -> "Unforced Errors",
      re(hay, NR.LegalRe) -> "Legal & Regulatory",
      re(hay, NR.RebrandingRe) -> "Rebranding",
      re(hay, NR.MnaRe) -> "Mergers and acquisitions",
      s"(${re(hay, NR.PlannedExecRe)} AND NOT ${re(hay, NR.PlannedExecExcludeRe)})" ->
        "Planned Executive Turnover")
    val primaryCase = "CASE WHEN NOT cand THEN NULL WHEN " + lp + " THEN NULL " +
      battery.map { case (cond, tag) => s"WHEN $cond THEN '$tag'" }.mkString(" ") +
      " ELSE NULL END"

    def inList(ts: Seq[String]) = ts.map(t => s"'$t'").mkString("(", ", ", ")")
    val groupRankCase = s"CASE WHEN tag IN ${inList(NR.CrisisTags)} THEN 0 " +
      s"WHEN tag IN ${inList(NR.NonCrisisTags)} THEN 1 ELSE 2 END"
    val tagOrderCase = "CASE " + NR.TagOrder.toSeq.sortBy(_._2)
      .map { case (t, i) => s"WHEN tag = '$t' THEN $i" }.mkString(" ") + " ELSE 999 END"

    s"""WITH items AS (
       |  SELECT source, text AS title,
       |    CASE WHEN doc_id % 3 = 0 THEN 'negative'
       |         WHEN doc_id % 3 = 1 THEN 'neutral' ELSE 'positive' END AS sentiment,
       |    (doc_id % 7 = 0) AS finance_routine
       |  FROM documents),
       |cls AS (
       |  SELECT source,
       |    (sentiment = 'negative' AND NOT finance_routine) AS cand,
       |    CASE WHEN (sentiment = 'negative' AND NOT finance_routine)
       |         THEN $primaryCase END AS tag
       |  FROM items),
       |agg AS (
       |  SELECT source,
       |    CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS negative_item_count,
       |    CAST(SUM(CASE WHEN cand AND tag IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tagged0,
       |    CAST(SUM(CASE WHEN cand AND tag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched0
       |  FROM cls GROUP BY source),
       |histo AS (
       |  SELECT source, tag, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY COUNT(*) DESC, $groupRankCase, $tagOrderCase, lower(tag)) AS rn
       |  FROM cls WHERE cand AND tag IS NOT NULL GROUP BY source, tag),
       |hsum AS (
       |  SELECT source,
       |    max(CASE WHEN rn = 1 THEN tag END) AS hp,
       |    max(CASE WHEN rn = 1 THEN cnt END) AS hpc,
       |    coalesce('[' || string_agg('"' || tag || '"', ',' ORDER BY rn) || ']', '[]') AS tags_json,
       |    coalesce('{' || string_agg('"' || tag || '":' || cnt, ',' ORDER BY rn) || '}', '{}') AS counts_json
       |  FROM histo GROUP BY source),
       |joined AS (
       |  SELECT a.source, a.negative_item_count, a.tagged0, a.unmatched0,
       |    a.negative_item_count >= ${NR.MinNegTopStories} AS gate_met,
       |    h.hp, h.hpc, coalesce(h.tags_json, '[]') AS tags_json,
       |    coalesce(h.counts_json, '{}') AS counts_json
       |  FROM agg a LEFT JOIN hsum h ON a.source = h.source),
       |named AS (
       |  SELECT *,
       |    CASE WHEN NOT gate_met THEN NULL
       |         WHEN hp IS NOT NULL THEN hp
       |         WHEN unmatched0 >= ${NR.OtherMinSupport} THEN 'Other' END AS primary_tag
       |  FROM joined)
       |SELECT source, negative_item_count,
       |  CASE WHEN gate_met THEN tagged0 ELSE 0 END AS tagged_item_count,
       |  CASE WHEN gate_met THEN unmatched0 ELSE negative_item_count END AS unmatched_negative_items,
       |  gate_met, primary_tag,
       |  CASE WHEN primary_tag IS NULL THEN NULL
       |       WHEN primary_tag IN ${inList(NR.CrisisTags)} THEN 'crisis'
       |       ELSE 'non_crisis' END AS primary_group,
       |  CASE WHEN primary_tag IS NULL THEN NULL
       |       ELSE primary_tag IN ${inList(NR.CrisisTags)} END AS is_crisis,
       |  CASE WHEN NOT gate_met THEN 0
       |       WHEN hp IS NOT NULL THEN hpc
       |       WHEN primary_tag = 'Other' THEN unmatched0
       |       ELSE 0 END AS supporting_negative_items,
       |  CASE WHEN NOT gate_met THEN '[]'
       |       WHEN tags_json <> '[]' THEN tags_json
       |       WHEN primary_tag = 'Other' THEN '["Other"]'
       |       ELSE '[]' END AS tags,
       |  CASE WHEN gate_met THEN counts_json ELSE '{}' END AS tag_counts,
       |  '${NR.RuleVersion}' AS rule_version
       |FROM named ORDER BY source""".stripMargin
  }
}
