package graft.ops

/** DuckDB oracles for [[TextOps]], [[DedupOps]] and [[SimilarityOps]].
  *
  * The md5-derived 60-bit hash is `CAST('0x' || substr(md5(s),1,15) AS
  * BIGINT)` — the exact value Spark computes via `conv(_,16,10)`. MinHash
  * permutation params are generated from the same closed-form
  * `(j*1103515245+12345) % P` / `(j*134775813+1) % P` formulas, so the
  * whole LSH pipeline is replicated stage by stage in SQL.
  */
object PipelineOracles {
  private val P = "2147483647"

  /** The four ANN oracle queries, as vals so q_ann_recall can compose
    * them as subqueries (the recall twin stays in sync by construction).
    */
  // Mirrors DedupOps.suffixDedupStats — but STRUCTURALLY INDEPENDENT:
  // the oracle materializes every suffix token list and sorts it
  // (affordable at oracle scale; DuckDB list comparison is
  // lexicographic, shorter-prefix-first — exactly the Spark side's
  // −1-padded rank order), takes adjacent doc-crossing pairs, and
  // computes each LCP by direct first-mismatch scan. nullif: DuckDB
  // list_position returns 0 (not NULL) when no mismatch exists (one
  // suffix is a prefix of the other) — the clamp case. Shared by
  // q_suffix_dedup and the stored-index serve row (output-identical).
  // Parameterized corpus filter so the DELETE row (q_suffix_index_delete)
  // reuses the identical construction over the post-delete corpus.
  private def suffixStatsSql(where: String): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents$where),""".stripMargin + "\n" +
    """s AS MATERIALIZED (
      |  SELECT doc_id, i AS p, w[i:len(w)] AS suf
      |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g),
      |o AS MATERIALIZED (
      |  SELECT doc_id, p, suf, row_number() OVER (ORDER BY suf, doc_id, p) AS sp
      |  FROM s),
      |pr AS (
      |  SELECT a.suf AS s1, b.suf AS s2, a.doc_id AS d1, b.doc_id AS d2
      |  FROM o a JOIN o b ON b.sp = a.sp + 1 AND a.doc_id <> b.doc_id),
      |lc AS MATERIALIZED (
      |  SELECT d1, d2,
      |         coalesce(nullif(list_position(list_transform(
      |             generate_series(1, least(len(s1), len(s2))),
      |             i -> s1[i] <> s2[i]), true), 0) - 1,
      |           least(len(s1), len(s2))) AS lcp
      |  FROM pr),
      |cred AS (SELECT d1 AS doc_id, lcp FROM lc UNION ALL SELECT d2, lcp FROM lc),
      |mx AS (SELECT doc_id, max(lcp) AS mx FROM cred GROUP BY 1)
      |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
      |       CAST(coalesce(mx.mx, 0) AS BIGINT) AS max_dup_tokens
      |FROM t LEFT JOIN mx USING (doc_id) ORDER BY t.doc_id""".stripMargin

  private val SUFFIX_STATS_SQL = suffixStatsSql("")

  private val ANN_BF =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, e.vec_id,
      |         list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) AS c,
      |         row_number() OVER (PARTITION BY q.q_id
      |           ORDER BY list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) DESC,
      |                    e.vec_id ASC) AS rank
      |  FROM q JOIN e ON e.vec_id <> q.q_id)
      |SELECT q_id, rank, vec_id AS neighbor_id, round(c, 3) AS cos
      |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private val ANN_LSH =
    """WITH planes AS (
      |  SELECT j, list_transform(range(1, 65), i ->
      |    (CAST(('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15)) AS BIGINT) % 2001 - 1000)::DOUBLE) AS w
      |  FROM generate_series(0, 7) t(j)
      |), e0 AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings
      |), b AS (
      |  SELECT e0.vec_id,
      |         sum(CASE WHEN list_dot_product(e0.v, p.w) > 0
      |                  THEN (1 << p.j) ELSE 0 END) AS bucket
      |  FROM e0 CROSS JOIN planes p GROUP BY e0.vec_id
      |), e AS (
      |  SELECT e0.vec_id, b.bucket, e0.v, e0.nrm
      |  FROM e0 JOIN b ON b.vec_id = e0.vec_id
      |), q AS (SELECT vec_id AS q_id, bucket, v AS qv, nrm AS qn FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, e.vec_id,
      |         list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) AS c,
      |         row_number() OVER (PARTITION BY q.q_id
      |           ORDER BY list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) DESC,
      |                    e.vec_id ASC) AS rank
      |  FROM q JOIN e ON bit_count(xor(e.bucket::BIGINT, q.bucket::BIGINT)) <= 3
      |             AND e.vec_id <> q.q_id)
      |SELECT q_id, rank, vec_id AS neighbor_id, round(c, 3) AS cos
      |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private val ANN_IVF =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings),
      |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM e
      |         ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
      |vc AS (
      |  SELECT e.vec_id, e.v, e.nrm, cent.c_id,
      |         row_number() OVER (PARTITION BY e.vec_id
      |           ORDER BY list_dot_product(e.v, cent.cv) / (sqrt(e.nrm) * sqrt(cent.cn)) DESC,
      |                    cent.c_id ASC) AS rn
      |  FROM e CROSS JOIN cent),
      |assign AS (SELECT vec_id AS m_id, v AS mv, nrm AS mn, c_id FROM vc WHERE rn <= 2),
      |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id FROM vc WHERE vec_id < 5 AND rn <= 4),
      |pairs AS (
      |  SELECT p.q_id, a.m_id,
      |         max(list_dot_product(p.qv, a.mv) / (sqrt(p.qn) * sqrt(a.mn))) AS c
      |  FROM probes p JOIN assign a ON a.c_id = p.c_id AND a.m_id <> p.q_id
      |  GROUP BY p.q_id, a.m_id),
      |scored AS (
      |  SELECT q_id, m_id, c,
      |         row_number() OVER (PARTITION BY q_id
      |           ORDER BY c DESC, m_id ASC) AS rank
      |  FROM pairs)
      |SELECT q_id, rank, m_id AS neighbor_id, round(c, 3) AS cos
      |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private val ANN_IVF_KMEANS =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |ew AS (SELECT vec_id, v, list_dot_product(v, v) AS nv FROM e),
      |c0 AS (SELECT * FROM (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS ck FROM e)
      |       ORDER BY ck LIMIT 8),
      |cw AS (SELECT CAST(row_number() OVER (ORDER BY ck) - 1 AS BIGINT) AS c_id, v AS cv,
      |              list_dot_product(v, v) AS nc FROM c0),
      |a1 AS (
      |  SELECT vec_id, v, c_id FROM (
      |    SELECT ew.vec_id, ew.v, cw.c_id,
      |           row_number() OVER (PARTITION BY ew.vec_id
      |             ORDER BY ew.nv - 2 * list_dot_product(ew.v, cw.cv) + cw.nc, cw.c_id) AS rn
      |    FROM ew CROSS JOIN cw) WHERE rn = 1
      |),
      |dims AS (
      |  SELECT c_id, j AS pos, SUM(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS s, count(*) AS n
      |  FROM a1, generate_series(1, 64) t(j) GROUP BY 1, 2
      |),
      |cm AS (SELECT c_id, pos, CAST(floor(s / (n::DOUBLE) + 0.5) AS BIGINT) AS cm FROM dims),
      |c1 AS (SELECT c_id, list(cm::DOUBLE / 1000000.0 ORDER BY pos) AS cv FROM cm GROUP BY c_id),
      |cent AS (SELECT c_id, cv, list_dot_product(cv, cv) AS cn FROM c1),
      |vc AS (
      |  SELECT ew.vec_id, ew.v, ew.nv, cent.c_id,
      |         row_number() OVER (PARTITION BY ew.vec_id
      |           ORDER BY list_dot_product(ew.v, cent.cv) / (sqrt(ew.nv) * sqrt(cent.cn)) DESC,
      |                    cent.c_id ASC) AS rn
      |  FROM ew CROSS JOIN cent),
      |assign AS (SELECT vec_id AS m_id, v AS mv, nv AS mn, c_id FROM vc WHERE rn = 1),
      |probes AS (SELECT vec_id AS q_id, v AS qv, nv AS qn, c_id FROM vc WHERE vec_id < 5 AND rn <= 3),
      |scored AS (
      |  SELECT p.q_id, a.m_id,
      |         list_dot_product(p.qv, a.mv) / (sqrt(p.qn) * sqrt(a.mn)) AS c,
      |         row_number() OVER (PARTITION BY p.q_id
      |           ORDER BY list_dot_product(p.qv, a.mv) / (sqrt(p.qn) * sqrt(a.mn)) DESC,
      |                    a.m_id ASC) AS rank
      |  FROM probes p JOIN assign a ON a.c_id = p.c_id AND a.m_id <> p.q_id)
      |SELECT q_id, rank, m_id AS neighbor_id, round(c, 3) AS cos
      |FROM scored WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  private val ANN_QR =
    """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e0),
        |e AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm,
        |             list_transform(v, x -> CAST(round(x * 127.0 / amax) AS BIGINT)) AS qv8
        |      FROM m WHERE amax > 0),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm, qv8 AS q_qv8
        |      FROM e WHERE vec_id < 5),
        |coarse AS (
        |  SELECT q.q_id, e.vec_id, e.v, e.nrm, q.q_v, q.q_nrm,
        |         CAST(list_dot_product(e.qv8::DOUBLE[], q.q_qv8::DOUBLE[]) AS BIGINT) AS iscore
        |  FROM q JOIN e ON e.vec_id <> q.q_id),
        |cand AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY iscore DESC, vec_id ASC) AS crank
        |  FROM coarse),
        |rescored AS (
        |  SELECT q_id, vec_id,
        |         list_dot_product(q_v, v) / (sqrt(q_nrm) * sqrt(nrm)) AS c
        |  FROM cand WHERE crank <= 40),
        |ranked AS (
        |  SELECT q_id, vec_id, c,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY c DESC, vec_id ASC) AS rank
        |  FROM rescored)
        |SELECT q_id, rank, vec_id AS neighbor_id, round(c, 3) AS cos
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  // Mirrors SimilarityOps.annIvfPq: the round-13 Lloyd-REFINED coarse
  // codebook (md5 seeds + one exact-integer mean round, exactly
  // pqCodebookRefined's arithmetic) + cell routing over the QUANTIZED
  // relation, int8 coarse scores within probed cells (exact BIGINT via
  // DOUBLE list_dot_product), top-40 candidates, float rescore by id
  // join. Parameterized like annAdcSql: `trainCond` restricts what the
  // codebook trains on (seed sample + Lloyd assignment pass),
  // `sameLabel` adds the member-label pre-filter before the cut,
  // `memberCond` restricts the posting assignment (the delete row).
  private def annPqSql(trainCond: String = "",
                       sameLabel: Boolean = false,
                       memberCond: String = "",
                       nprobe: Int = 4): String = {
    val lbl = if (sameLabel) ", label" else ""
    val lblE = if (sameLabel) ", e.label" else ""
    val lblPair = if (sameLabel) " AND a.m_label = p.q_label" else ""
    val assignLbl = if (sameLabel) "label AS m_label, " else ""
    val probeLbl = if (sameLabel) "label AS q_label, " else ""
    s"""WITH e0 AS (SELECT vec_id$lbl, embedding::DOUBLE[] AS v FROM embeddings),
       |m0 AS (SELECT vec_id$lbl, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e0),
       |e AS (SELECT vec_id$lbl, v, list_dot_product(v, v) AS nrm,
       |             list_transform(v, x -> CAST(round(x * 127.0 / amax) AS BIGINT)) AS qv8
       |      FROM m0 WHERE amax > 0),
       |et AS (SELECT * FROM e $trainCond),
       |cseed AS (SELECT vec_id AS c_id, v AS cv, nrm AS nc FROM et
       |          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
       |ca AS (
       |  SELECT c_id, v FROM (
       |    SELECT et.vec_id, cs.c_id, et.v,
       |           row_number() OVER (PARTITION BY et.vec_id
       |             ORDER BY et.nrm - 2 * list_dot_product(et.v, cs.cv) + cs.nc,
       |                      cs.c_id) AS rn
       |    FROM et CROSS JOIN cseed cs) WHERE rn = 1),
       |cdims AS (
       |  SELECT c_id, j AS pos,
       |         SUM(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS sm, count(*) AS n
       |  FROM ca, generate_series(1, 64) t(j) GROUP BY 1, 2),
       |cent AS MATERIALIZED (
       |  SELECT c_id, list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY pos) AS cv,
       |         CAST(SUM(cm * cm) AS BIGINT)::DOUBLE / 1000000000000.0 AS cn
       |  FROM (SELECT c_id, pos,
       |               CAST(floor(sm / (n::DOUBLE) + 0.5) AS BIGINT) AS cm
       |        FROM cdims) GROUP BY c_id),
       |vc AS (
       |  SELECT e.vec_id$lblE, e.qv8, cent.c_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY list_dot_product(e.v, cent.cv) / (sqrt(e.nrm) * sqrt(cent.cn)) DESC,
       |                    cent.c_id ASC) AS rn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id AS m_id, ${assignLbl}qv8 AS m_qv8, c_id
       |           FROM vc WHERE rn <= 2$memberCond),
       |probes AS (SELECT vec_id AS q_id, ${probeLbl}qv8 AS q_qv8, c_id FROM vc
       |           WHERE vec_id < 5 AND rn <= $nprobe),
       |coarse AS (
       |  SELECT p.q_id, a.m_id,
       |         max(CAST(list_dot_product(a.m_qv8::DOUBLE[], p.q_qv8::DOUBLE[]) AS BIGINT)) AS iscore
       |  FROM probes p JOIN assign a ON a.c_id = p.c_id AND a.m_id <> p.q_id$lblPair
       |  GROUP BY p.q_id, a.m_id),
       |cand AS (
       |  SELECT q_id, m_id FROM (
       |    SELECT q_id, m_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY iscore DESC, m_id ASC) AS crank
       |    FROM coarse) WHERE crank <= 40),
       |rescored AS (
       |  SELECT cd.q_id, cd.m_id,
       |         list_dot_product(q.v, t.v) / (sqrt(q.nrm) * sqrt(t.nrm)) AS c
       |  FROM cand cd
       |  JOIN e t ON t.vec_id = cd.m_id
       |  JOIN e q ON q.vec_id = cd.q_id),
       |ranked AS (
       |  SELECT q_id, m_id, c,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY c DESC, m_id ASC) AS rank
       |  FROM rescored)
       |SELECT q_id, rank, m_id AS neighbor_id, round(c, 3) AS cos
       |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  private val ANN_PQ = annPqSql()

  /** BPE merge-learning oracle machinery (TextOps.bpeTrain /
    * bpeFertility): fixed-round unrolled training. Each round r has
    * `i{r}` (adjacent-pair explode), `g{r}` (the argmax merge — ties
    * lexicographic on the pair), and `w{r}` (the merged word table via a
    * greedy left-to-right list_reduce fold, Spark's aggregate() twin —
    * element type LIST(VARCHAR) so accumulator and element unify). */
  private val BpeRounds = 16

  /** The fold applying merge `g.l + g.r` to a syms column — shared by
    * the training and apply chains. */
  private def bpeFold(syms: String, g: String): String =
    s"""list_reduce(list_transform($syms, x -> [x]),
       |          (acc, x) -> CASE WHEN acc[-1] = $g.l AND x[1] = $g.r
       |                      THEN list_append(list_slice(acc, 1, len(acc) - 1), $g.l || $g.r)
       |                      ELSE list_append(acc, x[1]) END)""".stripMargin

  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    // MATERIALIZED throughout: DuckDB inlines plain CTEs, so a 16-level
    // chain would re-evaluate w0 exponentially often (fd exhaustion —
    // the same hazard the MMR oracle hit).
    sb ++= """w0 AS MATERIALIZED (
             |  SELECT list_transform(generate_series(1, length(word)), i -> word[i]) AS syms,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
             |        FROM documents) t
             |  WHERE length(word) >= 2
             |  GROUP BY word)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |i$r AS (SELECT syms, n, unnest(generate_series(1, len(syms) - 1)) AS i FROM w${r - 1}),
                |g$r AS MATERIALIZED (SELECT l, r, CAST(sum(n) AS BIGINT) AS n_pair
                |        FROM (SELECT syms[i] AS l, syms[i + 1] AS r, n FROM i$r)
                |        GROUP BY l, r ORDER BY n_pair DESC, l, r LIMIT 1)""".stripMargin
      if (r < rounds)
        sb ++= s""",
                  |w$r AS MATERIALIZED (SELECT ${bpeFold("w.syms", "g")} AS syms, w.n
                  |        FROM w${r - 1} w CROSS JOIN g$r g)""".stripMargin
    }
    sb.toString
  }

  /** Perceptron-training oracle machinery (TextOps.perceptronFit):
    * hashed-BoW counts `b`, teacher labels `lab` (sign≥0 of the md5
    * closed-form teacher score on RAW counts), dense corpus bucket sums
    * `sb`, scalar doc count `dn`, dense zero weights `w0`, and per
    * unrolled round r: the misclassified set `x{r}` under the CENTERED
    * margin D·(c·w) − Σw·s, its sparse gradient `g{r}` plus the y-sum
    * scalar `ag{r}`, and the 1/r-decayed truncated-division update
    * `w{r}` — every step an exact integer sum/div, bit-identical to
    * Spark's. MATERIALIZED on b/lab/x/w: each is referenced by the
    * next round (and b by every round). */
  private val QtRounds = 8

  private def qualityTrainCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """b AS MATERIALIZED (
             |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id,
             |               CAST(('0x' || substr(md5('fh:' || w), 1, 15)) AS BIGINT) % 1024 AS bucket
             |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |              FROM documents))
             |  GROUP BY 1, 2),
             |tw AS (SELECT i AS bucket,
             |              CAST(('0x' || substr(md5('qw:' || i), 1, 15)) AS BIGINT) % 2001 - 1000 AS twgt
             |       FROM generate_series(0, 1023) g(i)),
             |lab AS MATERIALIZED (
             |  SELECT doc_id, CASE WHEN CAST(sum(c * twgt) AS BIGINT) >= 0
             |                 THEN 1 ELSE -1 END AS y
             |  FROM b JOIN tw USING (bucket) GROUP BY doc_id),
             |sb AS MATERIALIZED (
             |  SELECT i AS bucket, CAST(coalesce(t.s, 0) AS BIGINT) AS s
             |  FROM generate_series(0, 1023) g(i)
             |  LEFT JOIN (SELECT bucket, sum(c) AS s FROM b GROUP BY 1) t
             |    ON t.bucket = i),
             |dn AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
             |w0 AS (SELECT i AS bucket, CAST(0 AS BIGINT) AS wgt
             |       FROM generate_series(0, 1023) g(i))""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |ws${r - 1} AS (SELECT CAST(sum(w.wgt * s.s) AS BIGINT) AS ws
                |        FROM w${r - 1} w JOIN sb s USING (bucket)),
                |x$r AS MATERIALIZED (
                |  SELECT m.doc_id, l.y FROM (
                |    SELECT b.doc_id, CAST(sum(b.c * w.wgt) AS BIGINT) AS dot
                |    FROM b JOIN w${r - 1} w USING (bucket) GROUP BY 1) m
                |  JOIN lab l USING (doc_id)
                |  WHERE l.y * (m.dot * (SELECT d FROM dn) - (SELECT ws FROM ws${r - 1})) <= 0),
                |ag$r AS (SELECT CAST(coalesce(sum(y), 0) AS BIGINT) AS ym FROM x$r),
                |g$r AS (SELECT b.bucket, CAST(sum(x.y * b.c) AS BIGINT) AS gs
                |        FROM b JOIN x$r x USING (doc_id) GROUP BY 1),
                |w$r AS MATERIALIZED (
                |  SELECT bucket, CAST(wgt + CASE WHEN gg < 0 THEN -((-gg) // $r)
                |                             ELSE gg // $r END AS BIGINT) AS wgt
                |  FROM (SELECT w.bucket, w.wgt,
                |               CAST(coalesce(g.gs, 0) * (SELECT d FROM dn)
                |                    - s.s * (SELECT ym FROM ag$r) AS BIGINT) AS gg
                |        FROM w${r - 1} w LEFT JOIN g$r g USING (bucket)
                |        JOIN sb s USING (bucket)))""".stripMargin
    }
    sb.toString
  }

  /** The BPE-ENCODE oracle prefix shared by q_bpe_encode and
    * q_seq_pack_bpe: the bpeCtes training rounds, an apply chain
    * x0..xN over ALL distinct words (unlike the training table, no
    * length >= 2 filter), the learned vocabulary (base chars 1..26,
    * merge outputs 26 + first producing round, deduped by min round),
    * and the per-word exact aggregates `enc(word, n_ids, idsum, wsum)`
    * plus the positional corpus explode `dw(doc_id, wp, word)`.
    * `tail` is the final SELECT (or, with tailIsCte, further CTEs +
    * final SELECT). */
  private def bpeEncodeSql(tail: String, tailIsCte: Boolean = false): String = {
    val rounds = BpeRounds
    val applies = (1 to rounds).map(r =>
      s"""x$r AS MATERIALIZED (SELECT x.word, ${bpeFold("x.syms", "g")} AS syms
         |        FROM x${r - 1} x CROSS JOIN g$r g)""".stripMargin)
      .mkString(",\n")
    val picks = (1 to rounds)
      .map(r => s"SELECT $r AS mr, l || r AS merged FROM g$r")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(rounds)},
       |x0 AS MATERIALIZED (
       |  SELECT DISTINCT word,
       |         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents) t),
       |$applies,
       |vocab AS (
       |  SELECT chr(CAST(96 + i AS INT)) AS sym, CAST(i AS BIGINT) AS id
       |  FROM generate_series(1, 26) g(i)
       |  UNION ALL
       |  SELECT merged, CAST(26 + min(mr) AS BIGINT) FROM ($picks) GROUP BY merged),
       |encu AS (
       |  SELECT t.word, t.j, v.id
       |  FROM (SELECT x.word, gi.j, x.syms[gi.j] AS sym
       |        FROM x$rounds x,
       |             LATERAL (SELECT unnest(generate_series(1, len(x.syms))) AS j) gi) t
       |  JOIN vocab v USING (sym)),
       |enc AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n_ids,
       |         CAST(sum(id) AS BIGINT) AS idsum,
       |         CAST(sum(j * id) AS BIGINT) AS wsum
       |  FROM encu GROUP BY word),
       |dw AS (
       |  SELECT doc_id, i - 1 AS wp, words[i] AS word
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS words
       |        FROM documents) d,
       |       LATERAL (SELECT unnest(generate_series(1, len(words))) AS i) g)${
      if (tailIsCte) "," else ""}
       |$tail""".stripMargin
  }

  /** Mirrors SimilarityOps.annPqAdc / AnnIndexOps.servePq: TRUE product
    * quantization. Per-subspace codebooks from one exact-integer Lloyd
    * round over the shared md5 seed sample (kmeansCentroids' arithmetic
    * per subspace: micro-unit BIGINT sums, floor(S/n + 0.5) means, exact
    * Σcm² norms), members encoded to m codes + an exact reconstructed
    * norm, IVF cell routing as in ANN_PQ, ADC scoring = |q|² − 2·Σ_s
    * LUT[s,code_s] + rnrm_u/1e12 (every dot a left-to-right fold both
    * engines share; the norm an exact integer), k·expand cut ASC, exact
    * float rescore. The LUT joins unroll the m map lookups. */
  /** Parameterized builder: `trainCond` restricts the relations the
    * CODEBOOKS train on (coarse sample + PQ seed sample + the Lloyd
    * assignment pass) — the incremental row trains on the base slice
    * and encodes everything, exactly build-then-append. `sameLabel`
    * adds the member-label = query-label pre-filter to the candidate
    * join (BEFORE the k·expand cut). */
  private def annAdcSql(trainCond: String = "",
                        sameLabel: Boolean = false,
                        memberCond: String = "",
                        expand: Int = 8): String = {
    val m = 8; val kSub = 32; val sd = 8
    val lutJoins = (0 until m).map(i =>
      s"  JOIN lut l$i ON l$i.q_id = pr.q_id AND l$i.s = $i " +
        s"AND l$i.code = pr.pqc[${i + 1}]").mkString("\n")
    val adotSum = (0 until m).map(i => s"l$i.ldot").mkString(" + ")
    val lbl = if (sameLabel) ", label" else ""
    val lblE = if (sameLabel) ", e.label" else ""
    val lblVc = if (sameLabel) ", vc.label" else ""
    val lblPair = if (sameLabel) " AND a.label = p.label" else ""
    s"""WITH e0 AS (SELECT vec_id$lbl, embedding::DOUBLE[] AS v FROM embeddings),
       |m0 AS (SELECT vec_id$lbl, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e0),
       |e AS (SELECT vec_id$lbl, v, list_dot_product(v, v) AS nrm FROM m0 WHERE amax > 0),
       |et AS (SELECT * FROM e $trainCond),
       |cseed AS (SELECT vec_id AS c_id, v AS cv,
       |                 list_dot_product(v, v) AS nc FROM et
       |          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
       |ca AS (
       |  SELECT c_id, v FROM (
       |    SELECT et.vec_id, cs.c_id, et.v,
       |           row_number() OVER (PARTITION BY et.vec_id
       |             ORDER BY et.nrm - 2 * list_dot_product(et.v, cs.cv) + cs.nc,
       |                      cs.c_id) AS rn
       |    FROM et CROSS JOIN cseed cs) WHERE rn = 1),
       |cdims AS (
       |  SELECT c_id, j AS pos,
       |         SUM(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS sm, count(*) AS n
       |  FROM ca, generate_series(1, 64) t(j) GROUP BY 1, 2),
       |cent AS MATERIALIZED (
       |  SELECT c_id, list(CAST(cm AS DOUBLE) / 1000000.0 ORDER BY pos) AS cv,
       |         CAST(SUM(cm * cm) AS BIGINT)::DOUBLE / 1000000000000.0 AS cn
       |  FROM (SELECT c_id, pos,
       |               CAST(floor(sm / (n::DOUBLE) + 0.5) AS BIGINT) AS cm
       |        FROM cdims) GROUP BY c_id),
       |vc AS (
       |  SELECT e.vec_id$lblE, cent.c_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY list_dot_product(e.v, cent.cv) / (sqrt(e.nrm) * sqrt(cent.cn)) DESC,
       |                    cent.c_id ASC) AS rn
       |  FROM e CROSS JOIN cent),
       |sub AS (SELECT vec_id, s, list_slice(v, s*$sd+1, s*$sd+$sd) AS sv
       |        FROM e, generate_series(0, ${m - 1}) t(s)),
       |subT AS (SELECT vec_id, s, list_slice(v, s*$sd+1, s*$sd+$sd) AS sv
       |         FROM et, generate_series(0, ${m - 1}) t(s)),
       |sdv AS (SELECT vec_id, v,
       |               row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS rk
       |        FROM et),
       |c0 AS (SELECT s, rk - 1 AS code, list_slice(v, s*$sd+1, s*$sd+$sd) AS cv0
       |       FROM sdv, generate_series(0, ${m - 1}) t(s) WHERE rk <= $kSub),
       |c0w AS (SELECT s, code, cv0, list_dot_product(cv0, cv0) AS nc0 FROM c0),
       |a1 AS (
       |  SELECT s, code, sv FROM (
       |    SELECT subT.vec_id, subT.s, c0w.code, subT.sv,
       |           row_number() OVER (PARTITION BY subT.vec_id, subT.s
       |             ORDER BY list_dot_product(subT.sv, subT.sv)
       |                      - 2 * list_dot_product(subT.sv, c0w.cv0) + c0w.nc0,
       |                      c0w.code) AS rn
       |    FROM subT JOIN c0w ON c0w.s = subT.s) WHERE rn = 1),
       |dims AS (
       |  SELECT s, code, j AS pos,
       |         SUM(CAST(round(sv[j] * 1000000.0) AS BIGINT)) AS sm, count(*) AS n
       |  FROM a1, generate_series(1, $sd) t(j) GROUP BY 1, 2, 3),
       |cmt AS (SELECT s, code, pos,
       |               CAST(floor(sm / (n::DOUBLE) + 0.5) AS BIGINT) AS cm FROM dims),
       |cb AS (SELECT s, code, list(cm::DOUBLE / 1000000.0 ORDER BY pos) AS scv,
       |              CAST(SUM(cm * cm) AS BIGINT) AS snrm_u
       |       FROM cmt GROUP BY s, code),
       |a2 AS (
       |  SELECT vec_id, s, code, snrm_u FROM (
       |    SELECT sub.vec_id, sub.s, cb.code, cb.snrm_u,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.s
       |             ORDER BY list_dot_product(sub.sv, sub.sv)
       |                      - 2 * list_dot_product(sub.sv, cb.scv)
       |                      + CAST(cb.snrm_u AS DOUBLE) / 1000000000000.0,
       |                      cb.code) AS rn
       |    FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1),
       |codes AS (SELECT vec_id, list(code ORDER BY s) AS pqc,
       |                 CAST(SUM(snrm_u) AS BIGINT) AS rnrm_u
       |          FROM a2 GROUP BY vec_id),
       |assign AS (SELECT vc.vec_id AS m_id$lblVc, vc.c_id, c.pqc, c.rnrm_u
       |           FROM vc JOIN codes c ON c.vec_id = vc.vec_id WHERE vc.rn <= 2$memberCond),
       |probes AS (SELECT vec_id AS q_id$lbl, c_id FROM vc WHERE vec_id < 5 AND rn <= 4),
       |qrel AS (SELECT vec_id AS q_id, v AS qv, nrm AS q_nrm FROM e WHERE vec_id < 5),
       |lut AS (SELECT q.q_id, cb.s, cb.code,
       |               list_dot_product(list_slice(q.qv, cb.s*$sd+1, cb.s*$sd+$sd), cb.scv) AS ldot
       |        FROM qrel q CROSS JOIN cb),
       |pairs AS (
       |  SELECT p.q_id, a.m_id, a.pqc, a.rnrm_u
       |  FROM probes p JOIN assign a ON a.c_id = p.c_id AND a.m_id <> p.q_id$lblPair),
       |scored AS (
       |  SELECT pr.q_id, pr.m_id, pr.rnrm_u, $adotSum AS adot
       |  FROM pairs pr
       |$lutJoins),
       |coarse AS (
       |  SELECT s0.q_id, s0.m_id,
       |         min(q.q_nrm - 2 * s0.adot
       |             + CAST(s0.rnrm_u AS DOUBLE) / 1000000000000.0) AS adist
       |  FROM scored s0 JOIN qrel q ON q.q_id = s0.q_id
       |  GROUP BY s0.q_id, s0.m_id),
       |cand AS (
       |  SELECT q_id, m_id FROM (
       |    SELECT q_id, m_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY adist ASC, m_id ASC) AS crank
       |    FROM coarse) WHERE crank <= ${10 * expand}),
       |rescored AS (
       |  SELECT cd.q_id, cd.m_id,
       |         list_dot_product(q.v, t.v) / (sqrt(q.nrm) * sqrt(t.nrm)) AS c
       |  FROM cand cd
       |  JOIN e t ON t.vec_id = cd.m_id
       |  JOIN e q ON q.vec_id = cd.q_id),
       |ranked AS (
       |  SELECT q_id, m_id, c,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY c DESC, m_id ASC) AS rank
       |  FROM rescored)
       |SELECT q_id, rank, m_id AS neighbor_id, round(c, 3) AS cos
       |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  private val AnnAdc: String = annAdcSql()

  /** q_ann_pq_incremental: codebooks trained on the 90% base slice,
    * everything encoded/assigned/served against them. */
  private val AnnAdcIncremental: String =
    annAdcSql(trainCond = "WHERE vec_id % 10 <> 0")

  /** q_ann_pq_filtered: the member-label pre-filter before the cut. */
  private val AnnAdcFiltered: String = annAdcSql(sameLabel = true)

  /** q_ann_pq_delete: member assignment excludes the deleted slice;
    * codebooks, probes, and the float rescore stay full-corpus (the
    * Spark path deletes POSTING rows only). */
  private val AnnAdcDelete: String =
    annAdcSql(memberCond = " AND vc.vec_id % 10 <> 0")

  // length() (CHARACTER semantics) throughout — the Spark side splices
  // by character positions, and DuckDB strlen() counts BYTES, which
  // diverges (and breaks the conservation column) on non-ASCII text.
  // `head` must define w (per-position windows) and dw (the removal
  // intervals); the island/splice tail is shared by the cross-doc and
  // within-doc removal oracles.
  private def spliceSql(head: String): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
        |$head, mrk AS (
        |  SELECT doc_id, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                IS NULL
        |              OR s > max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS ns
        |  FROM dw
        |), isl AS (
        |  SELECT doc_id, s, e,
        |         SUM(ns) OVER (PARTITION BY doc_id ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        |  FROM mrk
        |), mi AS (
        |  SELECT doc_id, iid, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_islands,
        |         CAST(SUM(i_e - i_s + 1) AS BIGINT) AS removed_chars
        |  FROM mi GROUP BY 1
        |), gaps AS (
        |  SELECT doc_id,
        |         coalesce(lag(i_e) OVER (PARTITION BY doc_id ORDER BY i_s) + 1,
        |                  1) AS seg_s,
        |         i_s - 1 AS seg_e
        |  FROM mi
        |), tails AS (
        |  SELECT mi.doc_id, max(mi.i_e) + 1 AS seg_s, max(d.n_chars) AS seg_e
        |  FROM mi JOIN d USING (doc_id) GROUP BY mi.doc_id
        |), segs AS (
        |  SELECT u.doc_id, u.seg_s,
        |         substr(d.text, CAST(u.seg_s AS INT),
        |                CAST(u.seg_e - u.seg_s + 1 AS INT)) AS seg
        |  FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tails) u
        |  JOIN d USING (doc_id)
        |  WHERE u.seg_s <= u.seg_e
        |), sv AS (
        |  SELECT doc_id, string_agg(seg, '' ORDER BY seg_s) AS sv
        |  FROM segs GROUP BY doc_id
        |)
        |SELECT d.doc_id, d.n_chars,
        |       coalesce(a.n_islands, 0) AS n_islands,
        |       coalesce(a.removed_chars, 0) AS removed_chars,
        |       length(CASE WHEN a.n_islands IS NULL THEN d.text
        |                   ELSE coalesce(sv.sv, '') END) AS surviving_chars,
        |       md5(CASE WHEN a.n_islands IS NULL THEN d.text
        |                ELSE coalesce(sv.sv, '') END) AS surviving_md5
        |FROM d LEFT JOIN agg a USING (doc_id) LEFT JOIN sv USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin

  private def substrApplySql(stride: Int): String = spliceSql(
    s"""w AS (
       |  SELECT d.doc_id, d.n_chars, gs.p, substr(d.text, gs.p, 40) AS win
       |  FROM d,
       |       LATERAL (SELECT unnest(generate_series(
       |         1, greatest(len(d.text) - 39, 1), $stride)) AS p) gs
       |), dup AS (
       |  SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
       |), dw AS (
       |  SELECT w.doc_id, w.p AS s, least(w.p + 39, w.n_chars) AS e
       |  FROM w JOIN dup ON w.win = dup.win
       |)""".stripMargin)

  // Mirrors DedupOps.selfRepApply: keep-first per (doc, window content),
  // later occurrences become removal intervals, same island/splice tail.
  // win=16 (the driver row's choice — 40 is vacuous on the short
  // random-word fixture docs).
  private def selfRepSql(win: Int): String = spliceSql(
    s"""w AS (
       |  SELECT d.doc_id, d.n_chars, gs.p, substr(d.text, gs.p, $win) AS win
       |  FROM d,
       |       LATERAL (SELECT unnest(generate_series(
       |         1, greatest(len(d.text) - ${win - 1}, 1), 1)) AS p) gs
       |), dw AS (
       |  SELECT doc_id, p AS s, least(p + ${win - 1}, n_chars) AS e
       |  FROM (SELECT doc_id, n_chars, p,
       |               min(p) OVER (PARTITION BY doc_id, win) AS mp FROM w)
       |  WHERE p > mp
       |)""".stripMargin)

  // Mirrors DedupOps.suffixDedupApply: per-SUFFIX max cross-doc LCP via
  // the sorted-suffix order (runs of consecutive same-doc entries;
  // nearest other-doc neighbor on each side; LCP = min of adjacent LCPs
  // over the chain), token spans ≥ minTok become char intervals through
  // a per-doc token-length prefix sum, then the shared island/splice
  // tail. Adjacent LCPs come from DIRECT list first-mismatch scans (the
  // q_suffix_dedup oracle's technique) — structurally independent of the
  // Spark side's binary rank-table descent. The NULL-propagation CASE on
  // the prefix min matters: sp = 1 has no predecessor, and a plain min()
  // would skip the NULL and serve a same-doc lcp as a "crossing".
  private def suffixApplySql(minTok: Int): String = spliceSql(
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS wt FROM d),
       |sx AS MATERIALIZED (
       |  SELECT doc_id, i AS p, wt[i:len(wt)] AS suf
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(wt))) AS i) g),
       |o AS MATERIALIZED (
       |  SELECT doc_id, p, suf, row_number() OVER (ORDER BY suf, doc_id, p) AS sp
       |  FROM sx),
       |al AS MATERIALIZED (
       |  SELECT b.sp,
       |         coalesce(nullif(list_position(list_transform(
       |             generate_series(1, least(len(a.suf), len(b.suf))),
       |             i -> a.suf[i] <> b.suf[i]), true), 0) - 1,
       |           least(len(a.suf), len(b.suf))) AS lcp
       |  FROM o a JOIN o b ON b.sp = a.sp + 1),
       |rr AS (
       |  SELECT doc_id, p, sp,
       |         sp - row_number() OVER (PARTITION BY doc_id ORDER BY sp) AS rid
       |  FROM o),
       |rl AS MATERIALIZED (
       |  SELECT rr.doc_id, rr.p, rr.sp, rr.rid, al.lcp
       |  FROM rr LEFT JOIN al ON al.sp = rr.sp),
       |pcx AS (
       |  SELECT doc_id, p, sp, rid,
       |         CASE WHEN max(CASE WHEN lcp IS NULL THEN 1 ELSE 0 END)
       |                OVER (PARTITION BY doc_id, rid ORDER BY sp
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
       |              THEN NULL
       |              ELSE min(lcp) OVER (PARTITION BY doc_id, rid ORDER BY sp
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         END AS prevcross,
       |         min(lcp) OVER (PARTITION BY doc_id, rid ORDER BY sp
       |                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       |           AS sufmin
       |  FROM rl),
       |outl AS (
       |  SELECT re.doc_id, re.rid, al.lcp AS out_lcp
       |  FROM (SELECT doc_id, rid, max(sp) AS bsp FROM rl GROUP BY 1, 2) re
       |  LEFT JOIN al ON al.sp = re.bsp + 1),
       |mcx AS (
       |  SELECT pcx.doc_id, pcx.p,
       |         greatest(coalesce(pcx.prevcross, 0),
       |           coalesce(CASE WHEN ol.out_lcp IS NULL THEN NULL
       |                         ELSE least(ol.out_lcp,
       |                                    coalesce(pcx.sufmin, ol.out_lcp)) END,
       |                    0)) AS mc
       |  FROM pcx JOIN outl ol ON ol.doc_id = pcx.doc_id AND ol.rid = pcx.rid),
       |cs AS (
       |  SELECT doc_id, p, c_s, c_s + tl - 1 AS c_e FROM (
       |    SELECT doc_id, p, tl,
       |           1 + coalesce(sum(tl + 1) OVER (PARTITION BY doc_id ORDER BY p
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_s
       |    FROM (SELECT doc_id, i AS p, length(wt[i]) AS tl
       |          FROM t, LATERAL (SELECT unnest(generate_series(1, len(wt))) AS i) g2))),
       |dw AS (
       |  SELECT m.doc_id, a.c_s AS s, b.c_e AS e
       |  FROM mcx m
       |  JOIN cs a ON a.doc_id = m.doc_id AND a.p = m.p
       |  JOIN cs b ON b.doc_id = m.doc_id AND b.p = m.p + m.mc - 1
       |  WHERE m.mc >= $minTok)""".stripMargin)

  /** q_ann_pq: AnnAdc's serve result with the index-size accounting
    * columns (exact integers from the member count) cross-joined on. */
  private val AnnAdcSized: String = {
    val m = 8; val kSub = 32; val sd = 8; val dim = 64
    s"""WITH r AS ($AnnAdc),
       |n0 AS (SELECT count(*) AS n FROM (
       |  SELECT vec_id FROM embeddings
       |  WHERE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0)),
       |sz AS (SELECT CAST(n * ${m + 8} + ${m * kSub * sd * 8} AS BIGINT) AS pq_code_bytes,
       |              CAST(n * $dim AS BIGINT) AS int8_code_bytes FROM n0)
       |SELECT r.q_id, r.rank, r.neighbor_id, r.cos,
       |       sz.pq_code_bytes, sz.int8_code_bytes,
       |       sz.pq_code_bytes < sz.int8_code_bytes AS pq_smaller
       |FROM r CROSS JOIN sz ORDER BY q_id, rank""".stripMargin
  }

  /** Mirrors SimilarityOps.annLateInteraction: 16 pair cosines over the
    * 4×16-dim sub-vector slices, per-facet greatest, explicit
    * left-to-right facet sum — the same fold orders as the Spark
    * projection, so doubles (and therefore ranks) agree bit-for-bit. */
  private val AnnLateInteraction: String = {
    val parts = 4
    val dim = 16
    def sl(t: String, i: Int) = s"$t.v[${i * dim + 1}:${(i + 1) * dim}]"
    val norms = (0 until parts).map(i =>
      s"list_dot_product(v[${i * dim + 1}:${(i + 1) * dim}], " +
        s"v[${i * dim + 1}:${(i + 1) * dim}]) AS n$i").mkString(", ")
    val score = (0 until parts).map { i =>
      (0 until parts).map { j =>
        s"list_dot_product(${sl("q", i)}, ${sl("d", j)}) / (sqrt(q.n$i) * sqrt(d.n$j))"
      }.mkString("greatest(", ", ", ")")
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |s AS (SELECT vec_id, v, $norms FROM e),
       |p AS (
       |  SELECT q.vec_id AS q_id, d.vec_id AS neighbor_id,
       |         $score AS li
       |  FROM s q JOIN s d ON q.vec_id < 5 AND d.vec_id <> q.vec_id),
       |r AS (SELECT q_id, neighbor_id, li,
       |        row_number() OVER (PARTITION BY q_id
       |          ORDER BY li DESC, neighbor_id) AS rank
       |      FROM p)
       |SELECT q_id, rank, neighbor_id, round(li, 3) AS li_score
       |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  /** Filtered-search oracle: annPqSql with the member-label == query
    * label pre-filter on the coarse join — BEFORE the crank<=40 cut,
    * mirroring SimilarityOps.annIvfPqFiltered. Codebook, probes, and
    * rescore are unchanged. */
  private val AnnPqFiltered = annPqSql(sameLabel = true)

  /** Incremental-index oracle: annPqSql with the codebook TRAINED on
    * the 90% base slice only (seed sample + Lloyd assignment pass).
    * The Spark path builds from base, FREEZES the codebook, and
    * appends the delta batch against it, so every vector (base and
    * delta alike) ends up assigned to the base-only codebook — which
    * is exactly this SQL. */
  private val AnnPqIncremental = annPqSql(trainCond = "WHERE vec_id % 10 <> 0")

  /** Delete oracle: annPqSql with member assignment excluding the
    * deleted slice. Codebook, probes, and float rescore stay
    * full-corpus: the Spark path deletes POSTING rows only, and serve
    * routes through the unchanged stored codebook. */
  private val AnnPqDelete = annPqSql(memberCond = " AND vec_id % 10 <> 0")

  /** Mirrors SimilarityOps.embeddingDrift (and its streaming twin
    * q_stream_drift): ANN_IVF's md5 codebook drawn from the BASE slice,
    * nearest-1 cell assignment of every vector, per-cell (p−q)·ln(p/q)
    * PSI in micro-nats with ONE rounding per cell and NULL for
    * one-sided cells (q_psi_drift's rules).
    */
  private val DriftOracle: String =
    """WITH e AS (
        |  SELECT vec_id, vec_id % 10 = 0 AS is_delta, embedding::DOUBLE[] AS v,
        |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM e
        |         WHERE NOT is_delta ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        |vc AS (
        |  SELECT e.vec_id, e.is_delta, cent.c_id,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY list_dot_product(e.v, cent.cv) / (sqrt(e.nrm) * sqrt(cent.cn)) DESC,
        |                    cent.c_id ASC) AS rn
        |  FROM e CROSS JOIN cent),
        |hist AS (
        |  SELECT c_id,
        |         CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
        |         CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
        |  FROM vc WHERE rn = 1 GROUP BY c_id),
        |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS t_base,
        |               CAST(sum(n_delta) AS BIGINT) AS t_delta FROM hist)
        |SELECT c_id, n_base, n_delta,
        |       CAST(CASE WHEN n_base > 0 AND n_delta > 0 THEN
        |         round((CAST(n_base AS DOUBLE) / t_base -
        |                CAST(n_delta AS DOUBLE) / t_delta) *
        |               ln((CAST(n_base AS DOUBLE) / t_base) /
        |                  (CAST(n_delta AS DOUBLE) / t_delta)) * 1000000)
        |       END AS BIGINT) AS psi_micronat
        |FROM hist CROSS JOIN tot ORDER BY c_id""".stripMargin

  /** Mirrors SimilarityOps.mmrRerank: greedy maximal-marginal-relevance
    * over the brute-force top-40 pool, UNROLLED k=10 steps (the
    * q_pagerank unrolling precedent — DuckDB recursive CTEs can't carry
    * the selected set cleanly). Step i: among pool rows not yet in the
    * accumulator, per-candidate maxsim to the selected set, argmax of
    * `0.5·rel − 0.5·maxsim` with (score DESC, m_id ASC) tie-break —
    * exactly the Scala group loop's strict-`>` over ascending ids. All
    * arithmetic is the shared left-to-right double folds, so the match
    * is bit-exact. `pool`/`acc` carry MATERIALIZED hints: each step
    * references its predecessor 3×, so inlined CTEs expand ~3^k scans
    * of the embeddings parquet and exhaust the fd limit.
    */
  private val MmrOracle: String = {
    val base =
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |e AS (SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM e0),
        |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM e WHERE vec_id < 5),
        |cand AS (
        |  SELECT q.q_id, e.vec_id AS m_id, e.v, e.nrm,
        |         list_dot_product(q.q_v, e.v) / (sqrt(q.q_nrm) * sqrt(e.nrm)) AS rel
        |  FROM q JOIN e ON e.vec_id <> q.q_id),
        |pool AS MATERIALIZED (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY rel DESC, m_id ASC) AS pr FROM cand)
        |  WHERE pr <= 40),
        |sel1 AS (SELECT q_id, m_id, v, nrm, rel, 1 AS rank, 0.5 * rel AS mmr
        |         FROM pool WHERE pr = 1),
        |acc1 AS MATERIALIZED (SELECT * FROM sel1)""".stripMargin
    val steps = (2 to 10).map { i =>
      val p = i - 1
      s"""sel$i AS (
         |  SELECT q_id, m_id, v, nrm, rel, $i AS rank, mmr FROM (
         |    SELECT p.q_id, p.m_id, p.v, p.nrm, p.rel,
         |           0.5 * p.rel - 0.5 * ms.maxsim AS mmr,
         |           row_number() OVER (PARTITION BY p.q_id
         |             ORDER BY 0.5 * p.rel - 0.5 * ms.maxsim DESC, p.m_id ASC) AS rn
         |    FROM pool p
         |    JOIN (
         |      SELECT p2.q_id, p2.m_id,
         |             max(list_dot_product(p2.v, s.v) / (sqrt(p2.nrm) * sqrt(s.nrm))) AS maxsim
         |      FROM pool p2 JOIN acc$p s ON s.q_id = p2.q_id
         |      GROUP BY p2.q_id, p2.m_id) ms
         |      ON ms.q_id = p.q_id AND ms.m_id = p.m_id
         |    WHERE NOT EXISTS (SELECT 1 FROM acc$p x
         |                      WHERE x.q_id = p.q_id AND x.m_id = p.m_id))
         |  WHERE rn = 1),
         |acc$i AS MATERIALIZED (SELECT * FROM acc$p UNION ALL SELECT * FROM sel$i)""".stripMargin
    }
    val tail =
      """SELECT q_id, rank, m_id AS neighbor_id,
        |       round(rel, 3) AS cos, round(mmr, 3) AS mmr
        |FROM acc10 ORDER BY q_id, rank""".stripMargin
    (Seq(base) ++ steps).mkString(",\n") + "\n" + tail
  }

  /** doc → distinct word-3-shingle CTE fragment (lang-carrying).
    * Scalar `range()` + `list_transform` + `unnest` — DuckDB 1.0 does not
    * allow column arguments to the generate_series table function.
    */
  private val SH =
    """WITH toksrc AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3
      |), sh AS (
      |  SELECT doc_id, lang,
      |         unnest(list_distinct(list_transform(range(1, len(w) - 1),
      |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      |  FROM toksrc
      |)""".stripMargin

  /** Mirror of DedupOps.ngramJaccardPairs: 60-bit hashed shingle sets,
    * prefix-filtered (|A|-⌈0.8|A|⌉+1 smallest hashes; 1e-9 slack keeps
    * ceil off IEEE equality edges, identical on both engines) + df-capped
    * (≤ 50) candidate generation, exact-verified via list_intersect of
    * the full hash sets. Produces a `jac(doc_a, doc_b, jaccard)` CTE.
    */
  private val HASHJ =
    """, hsig AS (
      |  SELECT doc_id, lang,
      |         list_sort(list_distinct(list(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS hset
      |  FROM sh GROUP BY doc_id, lang
      |), pfx AS (
      |  SELECT doc_id, lang,
      |         unnest(list_slice(hset, 1, CAST(len(hset) - ceil(len(hset) * 0.8 - 1e-9) + 1 AS INT))) AS h
      |  FROM hsig
      |), pdf AS (
      |  SELECT lang, h FROM pfx GROUP BY lang, h HAVING count(*) <= 50
      |), rare AS (
      |  SELECT p.doc_id, p.lang, p.h
      |  FROM pfx p JOIN pdf ON pdf.lang = p.lang AND pdf.h = p.h
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM rare a JOIN rare b
      |    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
      |), jac AS (
      |  SELECT c.doc_a, c.doc_b,
      |         round(len(list_intersect(sa.hset, sb.hset))::DOUBLE /
      |               (len(sa.hset) + len(sb.hset) - len(list_intersect(sa.hset, sb.hset))), 6) AS jaccard
      |  FROM cand c
      |  JOIN hsig sa ON sa.doc_id = c.doc_a
      |  JOIN hsig sb ON sb.doc_id = c.doc_b
      |)""".stripMargin

  private val JACCARD_TAIL =
    """, sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |j AS (
      |  SELECT i.doc_a, i.doc_b,
      |         round(i.c::DOUBLE / (sa.n + sb.n - i.c), 6) AS jaccard
      |  FROM inter i
      |  JOIN sz sa ON sa.doc_id = i.doc_a
      |  JOIN sz sb ON sb.doc_id = i.doc_b
      |)
      |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Shared kNN edge relation (SimilarityOps.knnGraph, 8 planes /
    * Hamming ≤ 3): CTE chain ending in `r(q_id, neighbor_id, cos, rank)`.
    */
  private val KNN8 =
    """WITH planes AS (
      |  SELECT j, list_transform(range(1, 65), i ->
      |    (CAST(('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15)) AS BIGINT) % 2001 - 1000)::DOUBLE) AS w
      |  FROM generate_series(0, 7) t(j)
      |), e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings
      |), bk AS (
      |  SELECT e.vec_id,
      |         sum(CASE WHEN list_dot_product(e.v, p.w) > 0
      |                  THEN (1 << p.j) ELSE 0 END) AS bucket
      |  FROM e CROSS JOIN planes p GROUP BY e.vec_id
      |), masks AS (
      |  SELECT m FROM generate_series(0, 255) t(m) WHERE bit_count(m) <= 3
      |), probes AS (
      |  SELECT bk.vec_id AS q_id, xor(bk.bucket, m.m) AS bucket
      |  FROM bk CROSS JOIN masks m
      |), cand AS (
      |  SELECT p.q_id, bk.vec_id AS neighbor_id
      |  FROM probes p JOIN bk ON bk.bucket = p.bucket
      |  WHERE bk.vec_id <> p.q_id
      |), scored AS (
      |  SELECT c.q_id, c.neighbor_id,
      |         list_dot_product(q.v, n.v) / (sqrt(q.nrm) * sqrt(n.nrm)) AS cos
      |  FROM cand c
      |  JOIN e q ON q.vec_id = c.q_id
      |  JOIN e n ON n.vec_id = c.neighbor_id
      |), r AS (
      |  SELECT q_id, neighbor_id, cos,
      |         CAST(row_number() OVER (PARTITION BY q_id
      |           ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      |  FROM scored
      |)""".stripMargin

  val all: Map[String, String] = Map(
    // ---- TextOps ----
    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct,
        |  round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS ttr,
        |  round(len(list_filter(toks, x -> x = 'the' OR x = 'a'))::DOUBLE / len(toks), 6) AS stop_ratio,
        |  round((length(text) - len(toks) + 1)::DOUBLE / len(toks), 6) AS avg_token_len,
        |  round((len(list_distinct(toks))::DOUBLE / len(toks)) *
        |        (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a'))::DOUBLE / len(toks)), 6) AS quality_score
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS en_hits,
        |    len(list_filter(toks, x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) AS de_hits,
        |    len(list_filter(toks, x -> x = 'le' OR x = 'la' OR x = 'et')) AS fr_hits,
        |    len(list_filter(toks, x -> x = 'el' OR x = 'los' OR x = 'y')) AS es_hits
        |  FROM t)
        |SELECT doc_id, lang, en_hits, de_hits, fr_hits, es_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
        |       WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
        |       WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN es_hits > 0 THEN 'es'
        |       ELSE 'und' END AS pred_lang
        |FROM h ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.qEntropyFilter: exact char counts (substr over a
    // generated index — DuckDB has no empty-separator split), one
    // micro-nat rounding per (doc, char).
    "q_entropy_filter" ->
      """WITH ch AS (
        |  SELECT doc_id, substr(text, i, 1) AS ch
        |  FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text))) AS i
        |        FROM documents)),
        |g AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ch
        |      FROM g GROUP BY 1)
        |SELECT g.doc_id, max(n.n_ch) AS n_chars,
        |       count(*) AS n_distinct_chars,
        |       CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n_ch) *
        |            ln(CAST(c AS DOUBLE) / n_ch) * 1000000) AS BIGINT))
        |         AS BIGINT) AS entropy_micronat,
        |       CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n_ch) *
        |            ln(CAST(c AS DOUBLE) / n_ch) * 1000000) AS BIGINT))
        |         AS BIGINT) >= 2000000 AS keep
        |FROM g JOIN n USING (doc_id)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |         CAST(len(regexp_extract_all(text,
        |              '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |       CAST(sum(bpe) AS BIGINT) * 1000000 //
        |         CAST(sum(ws) AS BIGINT) AS fertility_ppm
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    // Mirrors TextOps.qChiSquare: exact-integer (O·N − nx·ny) with ONE
    // micro-unit rounding per cell; absent cells generated by the
    // marginal cross join.
    "q_chi_square" ->
      """WITH joint AS (
        |  SELECT lang, source, count(*) AS n_xy FROM documents GROUP BY 1, 2),
        |mx AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x
        |       FROM joint GROUP BY 1),
        |my AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y
        |       FROM joint GROUP BY 1),
        |n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM joint),
        |cells AS (
        |  SELECT mx.lang, my.source, coalesce(j.n_xy, 0) AS o,
        |         n_x, n_y, n_total
        |  FROM mx CROSS JOIN my CROSS JOIN n
        |  LEFT JOIN joint j ON j.lang = mx.lang AND j.source = my.source),
        |c2 AS (
        |  SELECT CAST(round(CAST(o*n_total - n_x*n_y AS DOUBLE) *
        |              (o*n_total - n_x*n_y) /
        |              (CAST(n_total AS DOUBLE) * n_x * n_y) * 1000000)
        |         AS BIGINT) AS chi_micro,
        |         lang, source
        |  FROM cells)
        |SELECT count(*) AS n_cells,
        |       CAST(sum(chi_micro) AS BIGINT) AS chi2_micro,
        |       (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
        |         AS dof
        |FROM c2""".stripMargin,

    "q_langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS en_hits,
        |    len(list_filter(toks, x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) AS de_hits,
        |    len(list_filter(toks, x -> x = 'le' OR x = 'la' OR x = 'et')) AS fr_hits,
        |    len(list_filter(toks, x -> x = 'el' OR x = 'los' OR x = 'y')) AS es_hits
        |  FROM t),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
        |         WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
        |         WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
        |         WHEN es_hits > 0 THEN 'es'
        |         ELSE 'und' END AS pred_lang
        |  FROM h),
        |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM c GROUP BY 1)
        |SELECT c.lang, c.pred_lang, c.n, tot.n_lang,
        |       c.n * 1000000 // tot.n_lang AS share_ppm
        |FROM c JOIN tot ON c.lang = tot.lang
        |ORDER BY c.lang, c.pred_lang""".stripMargin,

    // Mirrors TextOps.qSpanCorruption: one candidate span per 8-token
    // block, placement from the shared md5 surrogate, clipped to block.
    "q_span_corruption" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
        |           FROM documents),
        |b AS (SELECT doc_id, n, unnest(generate_series(0, (n-1)//8)) AS b
        |      FROM t),
        |c AS (
        |  SELECT doc_id, b, least(8, n - b*8) AS s,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |              CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS h
        |  FROM b)
        |SELECT doc_id, CAST(b AS BIGINT) AS sentinel,
        |       CAST(b*8 + h%6 + 1 AS BIGINT) AS span_start,
        |       CAST(least(1 + (h//6)%3, s - h%6) AS BIGINT) AS span_len
        |FROM c WHERE h % 6 < s
        |ORDER BY doc_id, sentinel""".stripMargin,

    // Count-min sketch twin: buckets are the shared md5-derived hash60
    // mod 1024, so the ESTIMATES are deterministic and hash-pinned, not
    // just the invariant flags. Integer `/ 100` divides to DOUBLE on both
    // engines (values far below 2^53 — exact).
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cells AS (SELECT seed, token FROM toks, unnest([0, 1, 2, 3]) AS s(seed)),
        |sketch AS (
        |  SELECT seed,
        |    CAST(('0x' || substr(md5('cms' || seed || ':' || token), 1, 15)) AS BIGINT) % 1024 AS bucket,
        |    count(*) AS cnt
        |  FROM cells GROUP BY 1, 2),
        |exact AS (
        |  SELECT token, count(*) AS exact_cnt FROM toks GROUP BY 1
        |  ORDER BY exact_cnt DESC, token ASC LIMIT 20),
        |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM sketch WHERE seed = 0),
        |probes AS (
        |  SELECT token, exact_cnt, seed,
        |    CAST(('0x' || substr(md5('cms' || seed || ':' || token), 1, 15)) AS BIGINT) % 1024 AS bucket
        |  FROM exact, unnest([0, 1, 2, 3]) AS s(seed)),
        |est AS (
        |  SELECT token, exact_cnt, CAST(min(cnt) AS BIGINT) AS cms_est
        |  FROM probes JOIN sketch USING (seed, bucket) GROUP BY 1, 2)
        |SELECT token, exact_cnt, cms_est,
        |  cms_est >= exact_cnt AS no_undercount,
        |  cms_est <= exact_cnt + n_total / 100 AS within_1pct_n
        |FROM est, total
        |ORDER BY exact_cnt DESC, token ASC""".stripMargin,

    // Mirrors TextOps.featureHash: shared md5 hash60 bucket map mod
    // 1024; vec_md5 digests the bucket-ORDERED pairs (numeric order —
    // Spark sorts the (bucket, c) structs, not the rendered strings).
    "q_feature_hash" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |b AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5('fh:' || w), 1, 15)) AS BIGINT) % 1024 AS bucket
        |      FROM t),
        |c AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id, count(*) AS nnz, CAST(sum(c) AS BIGINT) AS n_tokens,
        |       md5(string_agg(bucket || ':' || c, ',' ORDER BY bucket)) AS vec_md5
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.distinctNgrams: per-source distinct-1/distinct-2
    // shares in exact ppm; bigrams are the q_bigram_lm adjacent pairs.
    "q_distinct_ngrams" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT source, unnest(toks) AS w FROM t),
        |uni AS (SELECT source, count(*) AS n_uni, count(DISTINCT w) AS d_uni
        |        FROM u GROUP BY 1),
        |t2 AS (SELECT source, toks FROM t WHERE len(toks) >= 2),
        |bg AS (SELECT source, toks[CAST(i + 1 AS INT)] AS w1,
        |              toks[CAST(i + 2 AS INT)] AS w2
        |       FROM t2, unnest(range(0, len(toks) - 1)) u(i)),
        |bi AS (SELECT source, count(*) AS n_bi, count(DISTINCT (w1, w2)) AS d_bi
        |       FROM bg GROUP BY 1)
        |SELECT source, n_uni, d_uni, n_bi, d_bi,
        |       d_uni * 1000000 // n_uni AS distinct1_ppm,
        |       d_bi * 1000000 // n_bi AS distinct2_ppm
        |FROM uni JOIN bi USING (source) ORDER BY source""".stripMargin,

    "q_bigram_lm" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT toks[CAST(i + 1 AS INT)] AS w1, toks[CAST(i + 2 AS INT)] AS w2
        |  FROM t, unnest(range(0, len(toks) - 1)) u(i)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
        |SELECT w1, w2, c12, c1, round(c12 / CAST(c1 AS DOUBLE), 6) AS p_cond
        |FROM c12 JOIN c1 USING (w1)
        |ORDER BY c12 DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin,

    "q_token_topk" ->
      """SELECT tok AS token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,

    "q_doc_fingerprint" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  md5(text) AS fp_md5,
        |  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp60,
        |  CAST(('0x' || substr(md5(array_to_string(toks[1:8], ' ')), 1, 15)) AS BIGINT) AS prefix_fp60
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_bpe_token_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
        |  length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.packSequences: global token prefix sum in doc_id
    // order (the oracle may use the single-window form; Spark computes it
    // via the distributed bucket hierarchy), bin = start_offset // 2048.
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, n_tokens,
        |         coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM t
        |)
        |SELECT off // 2048 AS bin, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1 ORDER BY bin""".stripMargin,

    // Mirrors TextOps.qBpeMerges: adjacent-char pair frequencies over the
    // word-frequency table (pair work is per DISTINCT word), top 20.
    "q_bpe_merges" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents
        |), wc AS (
        |  SELECT word, count(*) AS n FROM w
        |  WHERE length(word) >= 2 GROUP BY word
        |), pos AS (
        |  SELECT word, n, unnest(range(1, length(word))) AS i FROM wc
        |)
        |SELECT substr(word, CAST(i AS INT), 2) AS pair,
        |       CAST(sum(n) AS BIGINT) AS n_pair
        |FROM pos GROUP BY 1 ORDER BY n_pair DESC, pair LIMIT 20""".stripMargin,

    // Mirrors TextOps.bpeTrain: 16 unrolled BPE rounds — per round the
    // pair-frequency argmax (ties lexicographic) and a list_reduce fold
    // applying the merge greedily left-to-right, exactly Spark's
    // aggregate() fold. See bpeCtes.
    "q_bpe_train" -> {
      val rounds = BpeRounds
      val picks = (1 to rounds).map(r =>
        s"SELECT $r AS merge_round, l AS lhs, r AS rhs, l || r AS merged, n_pair FROM g$r")
        .mkString("\n  UNION ALL ")
      s"""WITH ${bpeCtes(rounds)}
         |SELECT * FROM (
         |  $picks
         |) ORDER BY merge_round""".stripMargin
    },

    // Mirrors TextOps.bpeFertility: the q_bpe_train rounds train the
    // merges; a parallel fold chain applies them to the per-language
    // word tables; exact integer totals per lang.
    "q_bpe_fertility" -> {
      val rounds = BpeRounds
      val applies = (1 to rounds).map(r =>
        s"""a$r AS MATERIALIZED (SELECT a.lang, a.word, ${bpeFold("a.syms", "g")} AS syms, a.n
           |        FROM a${r - 1} a CROSS JOIN g$r g)""".stripMargin)
        .mkString(",\n")
      s"""WITH ${bpeCtes(rounds)},
         |a0 AS MATERIALIZED (
         |  SELECT lang, word,
         |         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         |        FROM documents) t
         |  GROUP BY lang, word),
         |$applies
         |SELECT lang, CAST(sum(n) AS BIGINT) AS n_occurrences,
         |       CAST(sum(n * length(word)) AS BIGINT) AS n_chars,
         |       CAST(sum(n * len(syms)) AS BIGINT) AS n_bpe_tokens
         |FROM a$rounds GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Mirrors TextOps.bpeEncode: the q_bpe_train rounds learn the
    // merges; x0..x16 applies them over ALL distinct words (no >=2
    // length filter — 1-char words encode too); vocab = base chars
    // 1..26 + merge outputs at 26 + first producing round; per-doc
    // exact aggregates over the (doc, word_pos) explode joined to the
    // encoded word table.
    "q_bpe_encode" -> bpeEncodeSql(
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(n_ids) AS BIGINT) AS n_bpe_tokens,
        |       CAST(sum(length(word)) AS BIGINT) AS n_alpha_chars,
        |       CAST(sum((wp + 1) * 1024 * idsum + wsum) AS BIGINT) AS ids_fp,
        |       CAST(sum(n_ids) AS BIGINT) * 1000000
        |         // CAST(count(*) AS BIGINT) AS fertility_micro
        |FROM dw JOIN enc USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // Mirrors TextOps.packSequencesBpe: the learned-BPE per-doc token
    // counts (0 for wordless docs) feed the q_seq_pack prefix-sum
    // packing tail.
    "q_seq_pack_bpe" -> bpeEncodeSql(
      """dcnt AS (
        |  SELECT doc_id, CAST(sum(n_ids) AS BIGINT) AS n_tokens
        |  FROM dw JOIN enc USING (word) GROUP BY doc_id),
        |t AS (
        |  SELECT d.doc_id, coalesce(c.n_tokens, 0) AS n_tokens
        |  FROM documents d LEFT JOIN dcnt c USING (doc_id)),
        |p AS (
        |  SELECT doc_id, n_tokens,
        |         coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        |  FROM t)
        |SELECT off // 2048 AS bin, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1 ORDER BY bin""".stripMargin, tailIsCte = true),

    // Mirrors TextOps.phraseSearch('window join'): positional postings,
    // adjacency via w[i]/w[i+1]; Spark's 0-based posexplode maps to
    // DuckDB's 1-based index as p0 = i - 1.
    "q_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (
        |  SELECT doc_id, i FROM t,
        |       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
        |  WHERE w[i] = 'window' AND w[i + 1] = 'join')
        |SELECT doc_id, count(*) AS n_matches,
        |       CAST(min(i) - 1 AS INT) AS first_pos,
        |       CAST(max(i) - 1 AS INT) AS last_pos
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.qualityTrain: the unrolled perceptron trajectory —
    // per round the misclassified count and exact weight aggregates.
    "q_quality_train" -> {
      val rows = (1 to QtRounds).map(r =>
        s"""SELECT $r AS round,
           |  (SELECT CAST(count(*) AS BIGINT) FROM x$r) AS n_mis,
           |  (SELECT CAST(sum(abs(wgt)) AS BIGINT) FROM w$r) AS w_l1,
           |  (SELECT CAST(sum((bucket + 1) * wgt) AS BIGINT) FROM w$r) AS w_checksum""".stripMargin)
        .mkString("\n  UNION ALL ")
      s"""WITH ${qualityTrainCtes(QtRounds)}
         |SELECT * FROM (
         |  $rows
         |) ORDER BY round""".stripMargin
    },

    // Mirrors TextOps.qualityClassify: the LEARNED perceptron weights
    // (q_quality_train's final round) served as the exact centered
    // margin D·(c·w) − Σw·s, pass = score >= 0.
    "q_quality_classify" ->
      s"""WITH ${qualityTrainCtes(QtRounds)},
         |wsf AS (SELECT CAST(sum(w.wgt * s.s) AS BIGINT) AS ws
         |        FROM w$QtRounds w JOIN sb s USING (bucket))
         |SELECT doc_id, count(*) AS nnz, CAST(sum(c) AS BIGINT) AS n_tokens,
         |       CAST(sum(c * wgt) * (SELECT d FROM dn)
         |            - (SELECT ws FROM wsf) AS BIGINT) AS score,
         |       CAST(sum(c * wgt) * (SELECT d FROM dn)
         |            - (SELECT ws FROM wsf) AS BIGINT) >= 0 AS quality_pass
         |FROM b JOIN w$QtRounds USING (bucket)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Streaming twin of q_quality_classify (DocStream.qStreamQualityGate):
    // the frozen-model gate drained through micro-batches must equal the
    // batch classifier's per-language aggregate — which is exactly this.
    "q_stream_quality_gate" ->
      s"""WITH ${qualityTrainCtes(QtRounds)},
         |wsf AS (SELECT CAST(sum(w.wgt * s.s) AS BIGINT) AS ws
         |        FROM w$QtRounds w JOIN sb s USING (bucket)),
         |sc AS (
         |  SELECT doc_id, CAST(sum(c * wgt) * (SELECT d FROM dn)
         |                      - (SELECT ws FROM wsf) AS BIGINT) AS score
         |  FROM b JOIN w$QtRounds USING (bucket) GROUP BY doc_id)
         |SELECT d.lang, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN sc.score >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_pass,
         |       CAST(coalesce(sum(CASE WHEN sc.score >= 0 THEN sc.score END), 0)
         |         AS BIGINT) AS passed_score
         |FROM documents d JOIN sc USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // Mirrors TextOps.qPipelineClassified: classifier gate (LEARNED
    // perceptron weights) -> keep-first exact dedup among survivors ->
    // per-language report.
    "q_pipeline_classified" ->
      s"""WITH ${qualityTrainCtes(QtRounds)},
         |wsf AS (SELECT CAST(sum(w.wgt * s.s) AS BIGINT) AS ws
         |        FROM w$QtRounds w JOIN sb s USING (bucket)),
         |s AS (
         |  SELECT doc_id, CAST(sum(c * wgt) * (SELECT d FROM dn)
         |                      - (SELECT ws FROM wsf) AS BIGINT) AS score
         |  FROM b JOIN w$QtRounds USING (bucket) GROUP BY doc_id
         |  HAVING CAST(sum(c * wgt) * (SELECT d FROM dn)
         |              - (SELECT ws FROM wsf) AS BIGINT) >= 0),
         |dd AS (
         |  SELECT d.doc_id, d.lang, d.n_chars, s.score,
         |         row_number() OVER (PARTITION BY md5(d.text)
         |           ORDER BY d.doc_id) AS rn
         |  FROM documents d JOIN s USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       CAST(sum(score) AS BIGINT) AS total_score
         |FROM dd WHERE rn = 1
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // Mirrors TextOps.qTokenZipf: top-100 token ranks, micro-nat ln
    // rounding, exact-integer regression num/den.
    "q_token_zipf" ->
      """WITH c AS (
        |  SELECT tok, count(*) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok
        |), top AS (
        |  SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 100
        |), rk AS (
        |  SELECT row_number() OVER (ORDER BY cnt DESC, tok) AS rank, cnt FROM top
        |), xy AS (
        |  SELECT CAST(round(ln(rank::DOUBLE) * 1000000) AS BIGINT) AS x,
        |         CAST(round(ln(cnt::DOUBLE) * 1000000) AS BIGINT) AS y
        |  FROM rk
        |)
        |SELECT count(*) AS n_fit,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den,
        |       round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)::DOUBLE /
        |             CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT), 6) AS zipf_slope
        |FROM xy""".stripMargin,

    // Mirrors TextOps.qMutualInfo: exact joint/marginal counts, per-cell
    // PMI rounded to micro-nats off identical exact-integer doubles.
    "q_mutual_info" ->
      """WITH joint AS (
        |  SELECT lang, source, count(*) AS n_xy FROM documents GROUP BY 1, 2
        |), mx AS (SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_x FROM joint GROUP BY 1),
        |my AS (SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_y FROM joint GROUP BY 1),
        |nt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_total FROM joint)
        |SELECT lang, source, n_xy, n_x, n_y, n_total,
        |       CAST(round(ln(n_xy::DOUBLE * n_total / (n_x::DOUBLE * n_y)) * 1000000) AS BIGINT) AS pmi_micronat
        |FROM joint JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN nt
        |ORDER BY lang, source""".stripMargin,

    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS g
        |      FROM t),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id < 10)
        |SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        |FROM g JOIN bench USING (g) WHERE g.doc_id >= 10
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    // Chunk windows mirror Spark's transform(sequence(...)): DuckDB list
    // slicing w[a:b] is 1-based end-inclusive == Spark slice(toks, a, 20).
    "q_chunk_documents" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |u AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(0, greatest(CAST(ceil((len(w) - 20) / 15.0) AS INT), 0) + 1),
        |           i -> struct_pack(chunk_id := i,
        |                            chunk := array_to_string(w[i*15+1 : i*15+20], ' ')))) AS s
        |  FROM t
        |)
        |SELECT doc_id, CAST(s.chunk_id AS INT) AS chunk_id,
        |       len(string_split(s.chunk, ' ')) AS n_tokens,
        |       md5(s.chunk) AS chunk_md5
        |FROM u ORDER BY doc_id, chunk_id""".stripMargin,

    "q_sample_deterministic" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,

    // Exact stratified sampling: ceil(20%) per language stratum in
    // deterministic md5-hash order (rn <= ceil(n/5) <=> 5*rn - 4 <= n).
    "q_stratified_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hkey,
        |         count(*) OVER (PARTITION BY lang) AS n_l
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, n_l,
        |         row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS rn
        |  FROM d
        |)
        |SELECT doc_id, lang, rn FROM r WHERE rn * 5 - 4 <= n_l
        |ORDER BY doc_id""".stripMargin,

    // Inverted index: per-token document frequency + posting summary for
    // tokens present in >= 10% of the corpus.
    "q_inverted_index" ->
      """WITH posts AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents
        |)
        |SELECT token, count(*) AS df,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |       CAST(sum(doc_id) AS BIGINT) AS posting_sum
        |FROM posts GROUP BY token
        |HAVING count(*) * 10 >= (SELECT count(*) FROM documents)
        |ORDER BY df DESC, token""".stripMargin,

    // Fixed-window substring duplication: 40-char windows at stride 20;
    // a window is duplicated when its content occurs in >= 2 docs.
    // Integer // division mirrors Spark's div exactly.
    "q_substr_dedup" ->
      """WITH w AS (
        |  SELECT d.doc_id, substr(d.text, gs.p, 40) AS win
        |  FROM documents d,
        |       LATERAL (SELECT unnest(generate_series(
        |         1, greatest(len(d.text) - 39, 1), 20)) AS p) gs
        |), dup AS (
        |  SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2
        |)
        |SELECT w.doc_id, count(*) AS n_win, count(dup.win) AS n_dup,
        |       count(dup.win) * 1000000 // count(*) AS dup_micro
        |FROM w LEFT JOIN dup ON w.win = dup.win
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,

    // Mirrors DedupOps.substrDedupApply: duplicated windows → per-doc
    // char intervals → running-end-max island merge → splice the
    // uncovered segments back together (string_agg ordered by segment
    // start = Spark's sorted-collect array_join). Conservation is
    // pinned in-row: removed + surviving = n_chars.
    "q_substr_apply" -> substrApplySql(20),

    // Alignment-free variant (DedupOps.qSubstrApplyExact): stride 1 —
    // every duplicated 40-char span is caught regardless of offset.
    "q_substr_apply_exact" -> substrApplySql(1),

    // Winnowing-gated variant (DedupOps.qSubstrApplyGated): IDENTICAL
    // removal semantics to the ungated stride-1 pass (the winnow
    // guarantee makes gating lossless — SubstrGateSpec pins engine-side
    // equality), PLUS the round-14 cost-honesty columns: gate_candidate
    // / gate_scanned_chars reproduce the winnow selection exactly
    // (hash60 char-shingle hashes, per-window list_min, ≥2-distinct-doc
    // fingerprints; short docs gate on exact text equality).
    "q_substr_apply_gated" -> {
      val kc = 20; val wc = 21 // win = 40: wc + kc - 1 = 40
      s"""WITH res AS (${substrApplySql(1)}),
         |dd AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
         |hs AS (
         |  SELECT doc_id, list_transform(generate_series(1, n_chars - ${kc - 1}),
         |           p -> CAST(('0x' || substr(md5(substr(text, p, $kc)), 1, 15))
         |                AS BIGINT)) AS h
         |  FROM dd WHERE n_chars >= 40),
         |fp AS (
         |  SELECT DISTINCT doc_id, f
         |  FROM (SELECT doc_id,
         |          unnest(list_transform(generate_series(0, len(h) - $wc),
         |            i -> list_min(h[i + 1:i + $wc]))) AS f
         |        FROM hs)),
         |shared AS (SELECT f FROM fp GROUP BY f HAVING count(DISTINCT doc_id) >= 2),
         |candLong AS (SELECT DISTINCT doc_id FROM fp JOIN shared USING (f)),
         |candShort AS (
         |  SELECT doc_id FROM dd WHERE n_chars < 40 AND text IN (
         |    SELECT text FROM dd WHERE n_chars < 40
         |    GROUP BY text HAVING count(DISTINCT doc_id) >= 2)),
         |cand AS (SELECT doc_id FROM candLong UNION SELECT doc_id FROM candShort)
         |SELECT res.*,
         |       CAST(CASE WHEN cand.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |         AS gate_candidate,
         |       CAST(CASE WHEN cand.doc_id IS NULL THEN 0 ELSE res.n_chars END
         |         AS BIGINT) AS gate_scanned_chars
         |FROM res LEFT JOIN cand USING (doc_id)
         |ORDER BY res.doc_id""".stripMargin
    },

    // WITHIN-doc repetition removal (DedupOps.selfRepApply).
    "q_selfrep_apply" -> selfRepSql(16),

    "q_suffix_dedup" -> SUFFIX_STATS_SQL,

    // The stored-index serve row is OUTPUT-identical to the stats row
    // by design (SA + adjacent LCPs determine the per-doc max exactly;
    // SuffixIndexSpec pins equality against suffixDedupStats) — the
    // oracle is the same SQL.
    "q_suffix_index_serve" -> SUFFIX_STATS_SQL,

    // The incremental row (build base → append the % 41 delta → serve
    // the union) must serve the IDENTICAL full-corpus statistics as a
    // from-scratch build: merging preserves the SA order and every
    // adjacent LCP up to tie ORDER among equal suffixes (the append
    // places delta rows after resident ties, a fresh build orders ties
    // by (doc_id, p) — served statistics are provably tie-invariant,
    // and SuffixIncrementalSpec's referee validates the stored
    // structure's tie-order-independent invariants rather than
    // row-for-row equality; the build-row checksums are defined only
    // for freshly built stores). The oracle is again the full-corpus
    // stats SQL.
    "q_suffix_index_incremental" -> SUFFIX_STATS_SQL,

    // GDPR delete off the durable index (build full corpus → delete
    // every % 53 doc, patching the O(runs) seam links/LCPs → serve the
    // remaining corpus FROM the patched artifact): the stored
    // structure must serve exactly what a fresh build over the
    // filtered corpus serves, so the oracle is the same stats
    // construction with the doomed docs filtered out.
    "q_suffix_index_delete" -> suffixStatsSql(" WHERE doc_id % 53 <> 0"),

    // The MAINTENANCE row composes delete + the suffix-aware normalizer
    // merge (region coalescing with the ordinal transform) before
    // serving: the generation-mixed, merged region layout must still
    // serve exactly the filtered corpus's statistics.
    "q_suffix_index_maintain" -> suffixStatsSql(" WHERE doc_id % 53 <> 0"),

    // The streaming maintenance twin drains the same % 41 delta as
    // micro-batches through the fingerprint-fenced append and serves
    // the same full-corpus statistics.
    "q_stream_suffix_index" -> SUFFIX_STATS_SQL,

    // SA range search (DedupOps.suffixIndexSearch): for each query —
    // the first 5 tokens of every doc_id % 97 document — count the
    // suffixes it prefixes and the distinct documents containing it.
    // The oracle is the direct quadratic join (every suffix × every
    // query, prefix-slice equality); the engine answers from two
    // binary-searched SA boundaries + one range scan of the matched
    // interval.
    "q_suffix_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |q AS (SELECT doc_id AS qid, w[1:5] AS qtok FROM t
        |      WHERE doc_id % 97 = 0 AND len(w) >= 5),
        |s AS MATERIALIZED (
        |  SELECT doc_id, i AS p, w[i:len(w)] AS suf
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g),
        |m AS (SELECT q.qid, s.doc_id
        |      FROM q JOIN s ON len(s.suf) >= 5 AND s.suf[1:5] = q.qtok)
        |SELECT q.qid AS query_id,
        |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_occurrences,
        |       CAST(coalesce(c.nd, 0) AS BIGINT) AS n_docs
        |FROM q LEFT JOIN (
        |  SELECT qid, count(*) AS n, count(DISTINCT doc_id) AS nd
        |  FROM m GROUP BY qid) c USING (qid)
        |ORDER BY query_id""".stripMargin,

    // Mirrors DedupOps.suffixIndexBuild's read-back accounting over the
    // STORED linked (sp, doc_id, p, lcp, prev_sp, prev_doc) relation:
    // DuckDB rebuilds the SA by direct suffix sort (1-based row_number
    // × 2^20 matches the Spark side's GAPPED bucket-start keys —
    // stored key = (0-based position + 1) · SuffixKeyGap), computes
    // every adjacent-pair LCP via lag (same-doc pairs included —
    // unlike the stats oracle's doc-crossing filter), and mirrors both
    // order-sensitive modular checksums: the (sp, p, doc) permutation
    // and the (prev_sp, prev_doc) link pointers.
    "q_suffix_index_build" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS MATERIALIZED (
        |  SELECT doc_id, i AS p, w[i:len(w)] AS suf
        |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g),
        |o AS MATERIALIZED (
        |  SELECT doc_id, p, suf, row_number() OVER (ORDER BY suf, doc_id, p) AS sp
        |  FROM s),
        |o2 AS MATERIALIZED (
        |  SELECT doc_id, p, sp, suf,
        |         lag(doc_id) OVER w AS pdoc,
        |         lag(sp) OVER w AS psp,
        |         lag(suf) OVER w AS psuf
        |  FROM o WINDOW w AS (ORDER BY sp)),
        |o3 AS (
        |  SELECT doc_id, p, sp * 1048576 AS sk, psp * 1048576 AS psk, pdoc,
        |         CASE WHEN psuf IS NULL THEN NULL ELSE
        |           coalesce(nullif(list_position(list_transform(
        |             generate_series(1, least(len(suf), len(psuf))),
        |             i -> suf[i] <> psuf[i]), true), 0) - 1,
        |           least(len(suf), len(psuf))) END AS lcp
        |  FROM o2)
        |SELECT CAST(count(*) AS BIGINT) AS n_suffixes,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(coalesce(sum(lcp), 0) AS BIGINT) AS sum_lcp,
        |       CAST(coalesce(sum((sk * 31 + p * 7 + doc_id) % 1000003), 0) AS BIGINT) AS checksum,
        |       CAST(coalesce(sum((coalesce(psk, -1) * 13 + coalesce(pdoc, -1)) % 1000003), 0) AS BIGINT) AS link_checksum
        |FROM o3""".stripMargin,

    // SUFFIX-ARRAY exact-span removal (DedupOps.suffixDedupApply):
    // discover at any length, remove every occurrence of a cross-doc
    // duplicated token span of ≥ 5 tokens (suffixApplySql's scaladoc
    // explains the run/min-chain construction).
    "q_suffix_apply" -> suffixApplySql(5),

    // Mirrors TextOps.qPipelineE2e: quality gate → cluster-apply dedup →
    // per-lang quota (rank DESC on md5-mod rscore, doc_id tiebreak) →
    // prefix-sum shard packing → per-shard manifest.
    "q_pipeline_e2e" ->
      s"""${SH.replaceFirst("WITH ", "WITH RECURSIVE ")}$HASHJ,
         |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
         |r(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b
         |),
         |dropped AS (
         |  SELECT a AS doc_id FROM r GROUP BY a HAVING a > least(a, min(b))
         |),
         |scored AS (
         |  SELECT doc_id, lang, n_chars FROM (
         |    SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents)
         |  WHERE len(w) >= 20
         |    AND (len(list_distinct(w))::DOUBLE / len(w)) *
         |        (1.0 - len(list_filter(w, x -> x = 'the' OR x = 'a'))::DOUBLE / len(w)) >= 0.3
         |),
         |surv AS (
         |  SELECT * FROM scored WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |),
         |samp AS (
         |  SELECT doc_id, lang, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY lang ORDER BY
         |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 DESC,
         |      doc_id) AS rn
         |    FROM surv) WHERE rn <= 40
         |),
         |packed AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST((sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          - n_chars) // 20000 AS BIGINT) AS shard_id
         |  FROM samp
         |)
         |SELECT shard_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       count(DISTINCT lang) AS n_langs
         |FROM packed GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    // Mirrors TextOps.trainSplit: md5-threshold 80/10/10 assignment.
    "q_train_split" ->
      """WITH h AS (
        |  SELECT lang,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS h
        |  FROM documents
        |)
        |SELECT lang,
        |       CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_docs
        |FROM h GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "q_split_leakage" ->
      """WITH d AS (
        |  SELECT md5(text) AS digest,
        |         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |                   1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |                   1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents),
        |g AS (
        |  SELECT digest,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |  FROM d GROUP BY 1)
        |SELECT count(*) AS n_groups,
        |  CAST(sum(CASE WHEN n_train + n_val + n_test > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dup_groups,
        |  CAST(sum(CASE WHEN (CASE WHEN n_train > 0 THEN 1 ELSE 0 END) +
        |                     (CASE WHEN n_val > 0 THEN 1 ELSE 0 END) +
        |                     (CASE WHEN n_test > 0 THEN 1 ELSE 0 END) > 1
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_groups,
        |  CAST(sum(n_train * n_val) AS BIGINT) AS leak_train_val,
        |  CAST(sum(n_train * n_test) AS BIGINT) AS leak_train_test,
        |  CAST(sum(n_val * n_test) AS BIGINT) AS leak_val_test
        |FROM g""".stripMargin,

    // Mirrors TextOps.repetitionScore: dup ratio = 1 - distinct/total for
    // words and word-2/3-grams (range(1,n) is end-exclusive, so counts
    // match Spark's size(toks)-k+1 totals exactly).
    "q_repetition_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3)
        |SELECT doc_id,
        |  round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6) AS dup_word_ratio,
        |  round(1.0 - len(list_distinct(list_transform(range(1, len(w)),
        |          i -> w[i] || ' ' || w[i+1])))::DOUBLE / (len(w) - 1), 6) AS dup_2gram_ratio,
        |  round(1.0 - len(list_distinct(list_transform(range(1, len(w) - 1),
        |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))::DOUBLE / (len(w) - 2), 6) AS dup_3gram_ratio
        |FROM t ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.quotaSample (graft_topk ranks rscore DESC, doc_id ASC).
    "q_quota_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS rscore
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, lang, rscore,
        |         row_number() OVER (PARTITION BY lang ORDER BY rscore DESC, doc_id) AS rn
        |  FROM h
        |)
        |SELECT doc_id, lang, rscore FROM r WHERE rn <= 40 ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.qTextNormalize (regexes in the Java∩RE2 dialect).
    "q_text_normalize" ->
      """SELECT doc_id,
        |       length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                                  '  +', ' ', 'g'))) AS norm_len,
        |       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                               '  +', ' ', 'g'))) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.tfidfTopTerms: exact-integer tf/df, idf = ln(N/df),
    // ranking on the ROUNDED score (ties on token) so rank order is
    // engine-independent.
    "q_tfidf_topterms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.tok,
        |         round(tf.tf * ln(n.n::DOUBLE / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (tok) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, tok, tfidf,
        |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INT) AS rk
        |  FROM s
        |)
        |SELECT doc_id, tok, tfidf, rk FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    // Mirrors SimilarityOps.quantizeEmbeddings: int8 symmetric quantization
    // with integer outputs (round-half-away-from-zero on both engines).
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |q AS (SELECT vec_id, amax,
        |             list_transform(v, x -> CAST(round(x * 127.0 / amax) AS INT)) AS qv
        |      FROM m WHERE amax > 0)
        |SELECT vec_id, round(amax, 6) AS amax,
        |       list_min(qv) AS qmin, list_max(qv) AS qmax,
        |       CAST(list_sum(qv) AS BIGINT) AS qsum
        |FROM q ORDER BY vec_id""".stripMargin,

    // Mirrors SimilarityOps.kmeansTwoRound: md5-seeded codebook, argmin
    // assignment (|v|²-2v·c+|c|² with list_dot_product = Spark's fold),
    // exact integer micro-unit mean update, re-assign, report sizes+norms.
    "q_kmeans" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ew AS (SELECT vec_id, v, list_dot_product(v, v) AS nv FROM e),
        |c0 AS (SELECT * FROM (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS ck FROM e)
        |       ORDER BY ck LIMIT 8),
        |cw AS (SELECT CAST(row_number() OVER (ORDER BY ck) - 1 AS BIGINT) AS c_id, v AS cv,
        |              list_dot_product(v, v) AS nc FROM c0),
        |a1 AS (
        |  SELECT vec_id, v, c_id FROM (
        |    SELECT ew.vec_id, ew.v, cw.c_id,
        |           row_number() OVER (PARTITION BY ew.vec_id
        |             ORDER BY ew.nv - 2 * list_dot_product(ew.v, cw.cv) + cw.nc, cw.c_id) AS rn
        |    FROM ew CROSS JOIN cw) WHERE rn = 1
        |),
        |dims AS (
        |  SELECT c_id, j AS pos, SUM(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS s, count(*) AS n
        |  FROM a1, generate_series(1, 64) t(j) GROUP BY 1, 2
        |),
        |cm AS (SELECT c_id, pos, CAST(floor(s / (n::DOUBLE) + 0.5) AS BIGINT) AS cm FROM dims),
        |c1 AS (
        |  SELECT c_id, list(cm::DOUBLE / 1000000.0 ORDER BY pos) AS cv,
        |         round(CAST(SUM(cm * cm) AS DOUBLE) / 1000000000000.0, 6) AS cnorm
        |  FROM cm GROUP BY c_id
        |),
        |cw2 AS (SELECT c_id, cv, cnorm, list_dot_product(cv, cv) AS nc FROM c1),
        |a2 AS (
        |  SELECT vec_id, c_id FROM (
        |    SELECT ew.vec_id, cw2.c_id,
        |           row_number() OVER (PARTITION BY ew.vec_id
        |             ORDER BY ew.nv - 2 * list_dot_product(ew.v, cw2.cv) + cw2.nc, cw2.c_id) AS rn
        |    FROM ew CROSS JOIN cw2) WHERE rn = 1
        |)
        |SELECT a2.c_id, count(*) AS n_members, cw2.cnorm
        |FROM a2 JOIN cw2 ON cw2.c_id = a2.c_id
        |GROUP BY a2.c_id, cw2.cnorm
        |ORDER BY a2.c_id""".stripMargin,

    // Mirrors SimilarityOps.annIvfKmeans: the q_kmeans centroid CTEs
    // produce the codebook, then the q_ann_ivf probe pattern runs on it.
    "q_ann_ivf_kmeans" -> ANN_IVF_KMEANS,

    // Mirrors SimilarityOps.annQuantizedRescore: q_embed_quantize's int8
    // codes (identical absmax arithmetic), exact BIGINT coarse dot (int8
    // magnitudes keep list_dot_product on DOUBLE[] exact: |dot| ≤
    // 127²·64 ≪ 2^53), top-40 candidates by (iscore, vec_id), then the
    // ANN_BF float-cosine rescore restricted to those candidates.
    "q_ann_quantized_rescore" -> ANN_QR,

    "q_ann_ivf_pq" -> ANN_PQ,
    "q_ann_pq" -> AnnAdcSized,
    "q_ann_pq_incremental" -> AnnAdcIncremental,
    "q_ann_pq_filtered" -> AnnAdcFiltered,
    "q_ann_pq_delete" -> AnnAdcDelete,
    // Rebalance is a pure layout rewrite — serving equals incremental.
    "q_ann_pq_rebalance" -> AnnAdcIncremental,
    "q_ann_filtered" -> AnnPqFiltered,
    "q_ann_late_interaction" -> AnnLateInteraction,

    // Store-served index (AnnIndexOps): same stages as annIvfPq with the
    // codebook + postings persisted in a KeyedStore between build and
    // serve — results are identical by construction, so the oracle IS
    // ANN_PQ. The row pins that the store round-trip (parquet codes,
    // composite-key range scans, sparse columns) is invisible to results.
    "q_ann_index_serve" -> ANN_PQ,

    "q_ann_index_incremental" -> AnnPqIncremental,

    // Rebalance is a pure layout rewrite (same rows, same keys, new
    // regions) — serving over the compacted index equals the
    // incremental result by construction.
    "q_ann_index_rebalance" -> AnnPqIncremental,

    "q_ann_index_delete" -> AnnPqDelete,

    // Store-served filtered search: the label rides the posting rows,
    // the serve composes the same shared stages — result identical to
    // the in-memory filtered path by construction.
    "q_ann_index_filtered" -> AnnPqFiltered,

    // Streaming twin of the incremental index: the delta drains as
    // AvailableNow micro-batches through appendBatch (insert-only,
    // replay-idempotent, order-commutative), so the final store — and
    // the serve result — is identical to the one-shot append.
    "q_stream_ann_index" -> AnnPqIncremental,
    // Streaming PQ appends drain to the same state as the batch
    // incremental row by the content-no-op argument above it.
    "q_stream_pq_index" -> AnnAdcIncremental,

    "q_mmr_rerank" -> MmrOracle,

    // Mirrors SimilarityOps.hybridRrf: BM25 (q_bm25's CTEs verbatim)
    // top-20 rank fused with the dense cosine top-20 rank for query
    // vector 0 by exact-integer RRF ppb: 10⁹ // (60 + r), missing side
    // contributes 0. The rrf terms are computed from the RAW (nullable)
    // ranks in a subquery — DuckDB's lateral alias binding must never
    // see the coalesced 0 (which would score an absent doc as rank 0).
    "q_hybrid_rrf" ->
      """WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM lens),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t
        |       WHERE token IN ('spark', 'join', 'data') GROUP BY 1, 2),
        |idf AS (SELECT token, ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) AS idf,
        |               n_docs, total_dl
        |        FROM (SELECT token, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN stats),
        |c AS (
        |  SELECT tf.doc_id,
        |         CAST(round(idf.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / (CAST(idf.total_dl AS DOUBLE) / idf.n_docs))) * 1000000.0) AS BIGINT) AS contrib_micro
        |  FROM tf JOIN idf USING (token) JOIN lens USING (doc_id)),
        |bm AS (SELECT doc_id, CAST(sum(contrib_micro) AS BIGINT) AS score_micro
        |       FROM c GROUP BY doc_id),
        |lexr AS (
        |  SELECT doc_id, rl FROM (
        |    SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rl
        |    FROM bm) WHERE rl <= 20),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id = 0),
        |denser AS (
        |  SELECT vec_id AS doc_id, rd FROM (
        |    SELECT q.q_id, e.vec_id,
        |           row_number() OVER (PARTITION BY q.q_id
        |             ORDER BY list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) DESC,
        |                      e.vec_id ASC) AS rd
        |    FROM q JOIN e ON e.vec_id <> q.q_id) WHERE rd <= 20),
        |f AS (
        |  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.rl, d.rd
        |  FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id)
        |SELECT doc_id, coalesce(rl, 0) AS r_lex, coalesce(rd, 0) AS r_dense,
        |       coalesce(1000000000 // (60 + rl), 0) +
        |       coalesce(1000000000 // (60 + rd), 0) AS rrf_ppb
        |FROM f ORDER BY rrf_ppb DESC, doc_id LIMIT 10""".stripMargin,

    // Mirrors SimilarityOps.hardNegatives: ANN_BF's scan with the
    // label-disagreement predicate in the join, top-5 per query.
    "q_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |      FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, e.vec_id, e.label,
        |         list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) AS c,
        |         row_number() OVER (PARTITION BY q.q_id
        |           ORDER BY list_dot_product(q.qv, e.v) / (sqrt(q.qn) * sqrt(e.nrm)) DESC,
        |                    e.vec_id ASC) AS rank
        |  FROM q JOIN e ON e.vec_id <> q.q_id AND e.label <> q.q_label)
        |SELECT q_id, rank, vec_id AS neg_id, round(c, 3) AS cos,
        |       label AS neg_label
        |FROM scored WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // Mirrors SimilarityOps.embeddingDrift: ANN_IVF's md5 codebook drawn
    // from the BASE slice, nearest-1 cell assignment of every vector,
    // per-cell (p−q)·ln(p/q) PSI in micro-nats with ONE rounding per
    // cell and NULL for one-sided cells (q_psi_drift's rules).
    "q_embedding_drift" -> DriftOracle,

    // Streaming twin: delta cell counts accumulate through the fenced
    // additive store merge; the final histogram — and the PSI report —
    // is identical to the batch monitor's.
    "q_stream_drift" -> DriftOracle,


    // Mirrors TextOps.packShards: shard = floor(exclusive prefix sum of
    // n_chars in doc_id order / 20000). The oracle's single global window
    // is fine at oracle scale; the Spark side computes the same prefix
    // sum distributed (bucketed two-phase).
    "q_shard_pack" ->
      """SELECT doc_id, n_chars,
        |  CAST((sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - n_chars) // 20000 AS BIGINT) AS shard_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The publish round trip is lossless, so the manifest oracle derives
    // the same shard assignment directly from the base table.
    "q_shard_publish" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars, lang,
        |    CAST((sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          - n_chars) // 20000 AS BIGINT) AS shard_id
        |  FROM documents)
        |SELECT shard_id, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       count(DISTINCT lang) AS n_langs
        |FROM p GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    "q_corpus_clean" ->
      s"""$SH$HASHJ,
         |drops AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM jac WHERE jaccard >= 0.8
         |), scored AS (
         |  SELECT doc_id, lang, n_chars,
         |         len(string_split(text, ' ')) AS n_tokens,
         |         (len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))) *
         |         (1.0 - len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a'))::DOUBLE
         |                / len(string_split(text, ' '))) AS quality
         |  FROM documents
         |)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |       round(avg(quality), 6) AS avg_quality
         |FROM scored
         |WHERE n_tokens >= 20 AND quality >= 0.3
         |  AND doc_id NOT IN (SELECT doc_id FROM drops)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // ---- DedupOps ----
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      s"""$SH$HASHJ
         |SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Connected components of the near-dup pair graph via a recursive
    // reachability closure (tiny: closure is per-component quadratic and
    // dedup components are small); cluster id = min reachable doc_id.
    "q_dedup_clusters" ->
      s"""${SH.replaceFirst("WITH ", "WITH RECURSIVE ")}$HASHJ,
         |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
         |r(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b
         |)
         |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |FROM r GROUP BY a ORDER BY doc_id""".stripMargin,

    // Mirrors DedupOps.dedupApply: drop every non-canonical (≠ min-id)
    // member of each near-dup component, keep the rest of the corpus.
    "q_dedup_apply" ->
      s"""${SH.replaceFirst("WITH ", "WITH RECURSIVE ")}$HASHJ,
         |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
         |r(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b
         |),
         |dropped AS (
         |  SELECT a AS doc_id FROM r GROUP BY a HAVING a > least(a, min(b))
         |)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    // Mirrors DedupOps.dedupKeepBest: per near-dup component keep the
    // member with the highest distinct-token ratio (exact ppm BIGINT),
    // ties to the smallest doc_id — the (ttr DESC, id ASC) row_number
    // is Spark's max_by struct tie-break.
    "q_dedup_keep_best" ->
      s"""${SH.replaceFirst("WITH ", "WITH RECURSIVE ")}$HASHJ,
         |p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
         |r(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b
         |),
         |memb AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
         |         FROM r GROUP BY a),
         |q AS (SELECT doc_id,
         |        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |          * 1000000 // len(string_split(text, ' ')) AS ttr_ppm
         |      FROM documents),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT m.doc_id, row_number() OVER (PARTITION BY m.cluster_id
         |             ORDER BY q.ttr_ppm DESC, m.doc_id ASC) AS rn
         |    FROM memb m JOIN q USING (doc_id)) WHERE rn = 1),
         |dropped AS (
         |  SELECT doc_id FROM memb
         |  WHERE doc_id NOT IN (SELECT doc_id FROM win))
         |SELECT d.doc_id, d.lang, d.n_chars, q.ttr_ppm
         |FROM documents d JOIN q USING (doc_id)
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY d.doc_id""".stripMargin,

    // NOTE (intentional asymmetry): the Spark side verifies candidate
    // pairs on 60-bit hash-set intersections (verifyByHashSets), while
    // this oracle intersects the shingle STRINGS — so a 60-bit collision
    // inflating an intersection count would surface as a hash mismatch
    // here instead of passing silently (risk ~2^-60 per pair; the
    // asymmetry is the guard, matching HASHJ's hashed form for ngram).
    // Deletion-neighborhood fuzzy match twin. substr length args clamp
    // the same way on both engines; the typo synthesis is mirrored.
    "q_fuzzy_match" ->
      """WITH vocab0 AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
        |typos AS (
        |  SELECT substr(tok, 1, 1) || substr(tok, 3, CAST(strlen(tok) - 2 AS INT)) AS tok
        |  FROM vocab0 WHERE strlen(tok) >= 4),
        |vocab AS (SELECT DISTINCT tok FROM (SELECT tok FROM vocab0 UNION ALL SELECT tok FROM typos)),
        |var AS (
        |  SELECT tok, unnest(list_distinct(list_append(
        |    list_transform(range(1, strlen(tok) + 1),
        |      i -> substr(tok, 1, CAST(i - 1 AS INT)) ||
        |           substr(tok, CAST(i + 1 AS INT), CAST(strlen(tok) - i AS INT))),
        |    tok))) AS v
        |  FROM vocab),
        |cand AS (
        |  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
        |  FROM var a JOIN var b ON a.v = b.v AND a.tok < b.tok)
        |SELECT tok_a, tok_b, CAST(levenshtein(tok_a, tok_b) AS INT) AS dist
        |FROM cand WHERE levenshtein(tok_a, tok_b) <= 1
        |ORDER BY tok_a, tok_b""".stripMargin,

    // Incremental dedup: batch (doc_id ≡ 0 mod 5) vs corpus. Exact =
    // shared md5 digest; near = the standard prefix-filtered Jaccard
    // pipeline (same SH/HASHJ CTEs) restricted to cross pairs; exact
    // takes precedence.
    "q_dedup_incremental" ->
      s"""$SH$HASHJ,
         |b AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
         |ex AS (
         |  SELECT DISTINCT b.doc_id
         |  FROM b JOIN (SELECT text FROM documents WHERE doc_id % 5 <> 0) c
         |    ON md5(b.text) = md5(c.text)),
         |nr AS (
         |  SELECT DISTINCT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id
         |  FROM jac
         |  WHERE jaccard >= 0.8 AND ((doc_a % 5 = 0) <> (doc_b % 5 = 0)))
         |SELECT b.doc_id,
         |       CASE WHEN ex.doc_id IS NOT NULL THEN 'dup_exact'
         |            WHEN nr.doc_id IS NOT NULL THEN 'dup_near'
         |            ELSE 'kept' END AS status
         |FROM b
         |LEFT JOIN ex ON ex.doc_id = b.doc_id
         |LEFT JOIN nr ON nr.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // Temperature-0.5 language rebalance: keep iff h²·n_l < 10¹²·n_min
    // (exact integers, HUGEINT products); flatness flag from exact
    // cross-multiplied rationals.
    // Mirrors TextOps.mixtureApply: the plan CTEs verbatim, then the
    // per-doc copies arithmetic with the md5-threshold fractional
    // epoch; HUGEINT only where the plan oracle needed it.
    "q_mixture_apply" ->
      """WITH per0 AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |per AS (
        |  SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
        |                 WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END AS isq
        |  FROM (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS s0 FROM per0)),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |               CAST(sum(isq) AS BIGINT) AS tot_isq FROM per),
        |plan AS (
        |  SELECT source,
        |         CAST((isq * 1000000 // tot_isq)::HUGEINT * tot_tokens // n_tokens
        |              AS BIGINT) AS epochs_ppm
        |  FROM per CROSS JOIN tot),
        |d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 1000000 AS h
        |  FROM documents),
        |cp AS (
        |  SELECT d.source, d.n_toks,
        |         epochs_ppm // 1000000 +
        |           CASE WHEN d.h < epochs_ppm % 1000000 THEN 1 ELSE 0 END AS copies
        |  FROM d JOIN plan USING (source)),
        |o AS (
        |  SELECT source, count(*) AS n_docs_in,
        |         CAST(sum(copies) AS BIGINT) AS n_copies_out,
        |         CAST(sum(copies * n_toks) AS BIGINT) AS tokens_out
        |  FROM cp GROUP BY source),
        |t2 AS (SELECT CAST(sum(tokens_out) AS BIGINT) AS tot_out FROM o)
        |SELECT source, n_docs_in, n_copies_out, tokens_out,
        |       tokens_out * 1000000 // tot_out AS achieved_ppm
        |FROM o CROSS JOIN t2 ORDER BY source""".stripMargin,

    // Mirrors TextOps.curriculumOrder: DuckDB's standard-SQL ntile
    // assigns the same contiguous runs as the Spark side's ntile
    // arithmetic (the q_spend_deciles contract), so rank_in_bin can be
    // the per-bin row_number here while Spark derives it closed-form.
    "q_curriculum_order" ->
      """WITH q AS (
        |  SELECT doc_id,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |           * 1000000 // len(string_split(text, ' ')) AS ttr_ppm
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, ttr_ppm,
        |         row_number() OVER w AS grank,
        |         ntile(10) OVER w AS bin
        |  FROM q WINDOW w AS (ORDER BY ttr_ppm DESC, doc_id)),
        |b AS (
        |  SELECT doc_id, ttr_ppm, CAST(bin AS INT) AS bin,
        |         row_number() OVER (PARTITION BY bin ORDER BY grank)
        |           AS rank_in_bin
        |  FROM r)
        |SELECT doc_id, ttr_ppm, bin,
        |       CAST(rank_in_bin AS BIGINT) AS rank_in_bin,
        |       CAST((rank_in_bin - 1) * 10 + bin - 1 AS BIGINT)
        |         AS curriculum_pos
        |FROM b ORDER BY curriculum_pos, doc_id""".stripMargin,

    // Mirrors TextOps.mixturePlan: α=0.5 temperature mixture in exact
    // integers — the isq CASE yields the true floor-sqrt on both
    // engines; epochs cross-multiplied in HUGEINT (= Spark's
    // DECIMAL(38,0)) before the floor division.
    "q_mixture_plan" ->
      """WITH per0 AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |per AS (
        |  SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
        |                 WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END AS isq
        |  FROM (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS s0 FROM per0)),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |               CAST(sum(isq) AS BIGINT) AS tot_isq FROM per)
        |SELECT source, n_docs, n_tokens,
        |       n_tokens * 1000000 // tot_tokens AS share_ppm,
        |       isq * 1000000 // tot_isq AS smooth_ppm,
        |       CAST((isq * 1000000 // tot_isq)::HUGEINT * tot_tokens // n_tokens
        |            AS BIGINT) AS epochs_ppm
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    "q_lang_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
        |mn AS (SELECT min(n_before) AS n_min FROM c),
        |h AS (
        |  SELECT d.lang,
        |         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |           % 1000000 AS hv,
        |         c.n_before
        |  FROM documents d JOIN c USING (lang)),
        |k AS (
        |  SELECT lang, count(*) AS n_after
        |  FROM h, mn
        |  WHERE CAST(hv * hv AS HUGEINT) * n_before
        |      < CAST(1000000000000 AS HUGEINT) * mn.n_min
        |  GROUP BY lang),
        |per AS (
        |  SELECT c.lang, c.n_before, coalesce(k.n_after, 0) AS n_after
        |  FROM c LEFT JOIN k USING (lang)),
        |f AS (
        |  SELECT max(n_after) * min(n_before) <= max(n_before) * min(n_after)
        |           AS flattened_ok
        |  FROM per)
        |SELECT per.lang, per.n_before, CAST(per.n_after AS BIGINT) AS n_after,
        |       f.flattened_ok
        |FROM per, f ORDER BY per.lang""".stripMargin,

    // Depth-2 deletion neighborhoods: d1 = each single deletion, d2 =
    // delete j then i<j (unshifted positions = unordered pairs), exact
    // levenshtein <= 2 verify — the same sound-and-complete construction
    // as the Spark side.
    "q_fuzzy_match2" ->
      """WITH vocab0 AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
        |typos1 AS (
        |  SELECT substr(tok, 1, 1) || substr(tok, 3, CAST(strlen(tok) - 2 AS INT)) AS tok
        |  FROM vocab0 WHERE strlen(tok) >= 4),
        |typos2 AS (
        |  SELECT substr(tok, 1, 2) || substr(tok, 4, CAST(strlen(tok) - 3 AS INT)) AS tok
        |  FROM vocab0 WHERE strlen(tok) >= 5),
        |vocab AS (SELECT DISTINCT tok FROM (
        |  SELECT tok FROM vocab0 UNION ALL SELECT tok FROM typos1
        |  UNION ALL SELECT tok FROM typos2)),
        |var AS (
        |  SELECT tok, unnest(list_distinct(
        |    list_append(
        |      list_transform(range(1, strlen(tok) + 1),
        |        i -> substr(tok, 1, CAST(i - 1 AS INT)) ||
        |             substr(tok, CAST(i + 1 AS INT), CAST(strlen(tok) - i AS INT))),
        |      tok) ||
        |    flatten(list_transform(list_filter(range(1, strlen(tok) + 1), j -> j >= 2),
        |      j -> list_transform(range(1, j),
        |        i -> substr(substr(tok, 1, CAST(j - 1 AS INT)) ||
        |                    substr(tok, CAST(j + 1 AS INT), CAST(strlen(tok) - j AS INT)),
        |                    1, CAST(i - 1 AS INT)) ||
        |             substr(substr(tok, 1, CAST(j - 1 AS INT)) ||
        |                    substr(tok, CAST(j + 1 AS INT), CAST(strlen(tok) - j AS INT)),
        |                    CAST(i + 1 AS INT), CAST(strlen(tok) - 1 - i AS INT)))))
        |  )) AS v
        |  FROM vocab),
        |cand AS (
        |  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b
        |  FROM var a JOIN var b ON a.v = b.v AND a.tok < b.tok)
        |SELECT tok_a, tok_b, CAST(levenshtein(tok_a, tok_b) AS INT) AS dist
        |FROM cand WHERE levenshtein(tok_a, tok_b) <= 2
        |ORDER BY tok_a, tok_b""".stripMargin,

    // MinHash estimator accuracy: same signature/band pipeline as
    // q_dedup_minhash_lsh, but emitting est vs exact Jaccard per LSH
    // candidate with the ±0.35 tolerance flag. Pairs with zero true
    // intersection (band collisions) survive via the LEFT JOIN.
    "q_minhash_estimate" ->
      s"""$SH, hs AS (
         |  SELECT doc_id, lang,
         |         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $P AS h
         |  FROM sh
         |), sig AS (
         |  SELECT doc_id, lang, j,
         |         min((((j::BIGINT * 1103515245 + 12345) % $P) * h +
         |              ((j::BIGINT * 134775813 + 1) % $P)) % $P) AS mh
         |  FROM hs, generate_series(1, 32) t(j)
         |  GROUP BY 1, 2, 3
         |), bands AS (
         |  SELECT doc_id, lang, (j - 1) // 4 AS band_id,
         |         string_agg(mh::VARCHAR, ',' ORDER BY j) AS band_key
         |  FROM sig GROUP BY 1, 2, 3
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.lang = b.lang AND a.band_id = b.band_id
         |   AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |), agree AS (
         |  SELECT c.doc_a, c.doc_b,
         |         CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_a
         |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.j = sa.j
         |  GROUP BY 1, 2
         |), inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY 1, 2
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |res AS (
         |  SELECT a.doc_a, a.doc_b, a.n_agree,
         |         round(a.n_agree / 32.0, 6) AS est_jaccard,
         |         round(coalesce(i.c, 0)::DOUBLE /
         |               (sa.n + sb.n - coalesce(i.c, 0)), 6) AS exact_jaccard
         |  FROM agree a
         |  LEFT JOIN inter i ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
         |  JOIN sz sa ON sa.doc_id = a.doc_a
         |  JOIN sz sb ON sb.doc_id = a.doc_b
         |)
         |SELECT doc_a, doc_b, n_agree, est_jaccard, exact_jaccard,
         |       abs(est_jaccard - exact_jaccard) <= 0.35 AS within_tol
         |FROM res ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_minhash_lsh" ->
      s"""$SH, hs AS (
         |  SELECT doc_id, lang,
         |         CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % $P AS h
         |  FROM sh
         |), sig AS (
         |  SELECT doc_id, lang, j,
         |         min((((j::BIGINT * 1103515245 + 12345) % $P) * h +
         |              ((j::BIGINT * 134775813 + 1) % $P)) % $P) AS mh
         |  FROM hs, generate_series(1, 32) t(j)
         |  GROUP BY 1, 2, 3
         |), bands AS (
         |  SELECT doc_id, lang, (j - 1) // 4 AS band_id,
         |         string_agg(mh::VARCHAR, ',' ORDER BY j) AS band_key
         |  FROM sig GROUP BY 1, 2, 3
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.lang = b.lang AND a.band_id = b.band_id
         |   AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |), inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS c
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY 1, 2
         |)$JACCARD_TAIL""".stripMargin,

    "q_dedup_simhash" ->
      """WITH tc AS (
        |  SELECT doc_id, lang, tok, count(*) AS c FROM
        |    (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2, 3
        |), th AS (
        |  SELECT doc_id, lang, c,
        |         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM tc
        |), bsum AS (
        |  SELECT doc_id, lang, j,
        |         sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS s
        |  FROM th, generate_series(0, 59) t(j)
        |  GROUP BY 1, 2, 3
        |), fp AS (
        |  SELECT doc_id, lang,
        |         sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS fp
        |  FROM bsum GROUP BY 1, 2
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.fp, b.fp)) AS hamming
        |FROM fp a JOIN fp b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Mirrors DedupOps.embeddingCosinePairs: 8 md5-derived planes → 4
    // bands of 2 sign bits; candidates share a (label, band) bucket, then
    // exact cosine verify at the 3dp-rounded threshold.
    "q_dedup_embedding_cosine" ->
      """WITH planes AS (
        |  SELECT j, list_transform(range(1, 65), i ->
        |    (CAST(('0x' || substr(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 15)) AS BIGINT) % 2001 - 1000)::DOUBLE) AS w
        |  FROM generate_series(0, 7) t(j)
        |), e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
        |  FROM embeddings
        |), bk AS (
        |  SELECT e.vec_id,
        |         sum(CASE WHEN list_dot_product(e.v, p.w) > 0
        |                  THEN (1 << p.j) ELSE 0 END) AS bucket
        |  FROM e CROSS JOIN planes p GROUP BY e.vec_id
        |), banded AS (
        |  SELECT e.vec_id, e.label, t.j AS band_id,
        |         (bk.bucket >> (2 * t.j)) & 3 AS band_val
        |  FROM e JOIN bk ON bk.vec_id = e.vec_id, generate_series(0, 3) t(j)
        |), cand AS (
        |  SELECT DISTINCT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM banded a JOIN banded b
        |    ON a.label = b.label AND a.band_id = b.band_id
        |   AND a.band_val = b.band_val AND a.vec_id < b.vec_id
        |)
        |SELECT c.label, c.vec_a, c.vec_b,
        |       round(list_dot_product(x.v, y.v) / (sqrt(x.nrm) * sqrt(y.nrm)), 3) AS cos
        |FROM cand c
        |JOIN e x ON x.vec_id = c.vec_a
        |JOIN e y ON y.vec_id = c.vec_b
        |WHERE round(list_dot_product(x.v, y.v) / (sqrt(x.nrm) * sqrt(y.nrm)), 3) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    // ---- MultimodalOps ----
    // Byte-level twin of MultimodalOps.FakeDecode: fixture text is pure
    // ASCII (strlen == length for every doc), so byte i of the UTF-8
    // payload is unicode(substr(text, i+1, 1)). Quadrant means are exact
    // (integer sum / 64.0, a power of two — no float rounding anywhere);
    // resize cells are integer division; frame means are formatted %.6f,
    // where C printf (DuckDB) and Java String.format agree because a
    // decimal tie at 1e-7 would require the double to equal odd/128,
    // impossible for s/len with len ≤ 64 (see the derivation in
    // MultimodalOps).
    // Mirrors MultimodalOps.imagePhashPairs byte-for-byte: same 16x16
    // decode as q_image_features, 8x8 box downsample by index
    // arithmetic (i -> cell (i//16//2)*8 + (i%16)//2), exact-integer
    // threshold rv*64 > total. The oracle verifies hamming PER BIT over
    // all pairs (oracle-scale brute force); the Spark side's banded
    // candidates + bit_count(xor) are recall-complete at hamming <= 3
    // by pigeonhole, so the two pair sets coincide.
    "q_image_phash" ->
      """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
        |b AS (
        |  SELECT doc_id, i,
        |         CASE WHEN i < len THEN unicode(substr(text, CAST(i + 1 AS INT), 1)) ELSE 0 END AS v
        |  FROM d, generate_series(0, 255) t(i)),
        |rz AS (
        |  SELECT doc_id, (i // 16 // 2) * 8 + (i % 16) // 2 AS j,
        |         CAST(sum(v) // 4 AS BIGINT) AS rv
        |  FROM b GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(rv) AS BIGINT) AS s FROM rz GROUP BY 1),
        |bits AS (
        |  SELECT rz.doc_id, j, CASE WHEN rv * 64 > s THEN 1 ELSE 0 END AS bit
        |  FROM rz JOIN tot ON tot.doc_id = rz.doc_id)
        |SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
        |       CAST(sum(CASE WHEN a.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        |FROM bits a JOIN bits bb ON a.j = bb.j AND a.doc_id < bb.doc_id
        |GROUP BY 1, 2 HAVING hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Byte-level twin of MultimodalOps.FakeAudio: all features are exact
    // integers (centered-byte energy, mean crossings, per-frame sums
    // digested as decimal strings), so no float formatting is involved
    // anywhere. 1-based list slices clamp like Spark's grouped().
    "q_audio_frames" ->
      """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
        |s AS (
        |  SELECT doc_id, len,
        |    list_transform(range(1, len + 1),
        |      i -> unicode(substr(text, CAST(i AS INT), 1)) - 100) AS c
        |  FROM d)
        |SELECT doc_id, CAST(len AS BIGINT) AS n_samples,
        |  CAST(ceil(len / 256.0) AS BIGINT) AS n_frames,
        |  CAST(list_sum(list_transform(c, x -> x * x)) AS BIGINT) AS energy_u,
        |  CAST(len(list_filter(range(1, len), i -> c[CAST(i AS INT)] * c[CAST(i + 1 AS INT)] < 0)) AS BIGINT) AS mean_cross,
        |  md5(array_to_string(
        |    list_transform(range(0, CAST(ceil(len / 256.0) AS BIGINT)),
        |      f -> CAST(list_sum(c[CAST(f * 256 + 1 AS INT):CAST(f * 256 + 256 AS INT)]) AS BIGINT)),
        |    ',')) AS frames_md5
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_image_features" ->
      """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
        |b AS (
        |  SELECT doc_id, i,
        |         CASE WHEN i < len THEN unicode(substr(text, CAST(i + 1 AS INT), 1)) ELSE 0 END AS v
        |  FROM d, generate_series(0, 255) t(i)
        |),
        |q AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN i // 16 < 8 AND i % 16 < 8 THEN v ELSE 0 END) AS BIGINT) / 64.0 AS q1_mean,
        |    CAST(SUM(CASE WHEN i // 16 < 8 AND i % 16 >= 8 THEN v ELSE 0 END) AS BIGINT) / 64.0 AS q2_mean,
        |    CAST(SUM(CASE WHEN i // 16 >= 8 AND i % 16 < 8 THEN v ELSE 0 END) AS BIGINT) / 64.0 AS q3_mean,
        |    CAST(SUM(CASE WHEN i // 16 >= 8 AND i % 16 >= 8 THEN v ELSE 0 END) AS BIGINT) / 64.0 AS q4_mean
        |  FROM b GROUP BY doc_id
        |),
        |rz AS (
        |  SELECT doc_id,
        |    CAST((max(CASE WHEN i = 0 THEN v END) + max(CASE WHEN i = 1 THEN v END)
        |        + max(CASE WHEN i = 16 THEN v END) + max(CASE WHEN i = 17 THEN v END)) // 4 AS INT) AS rz1,
        |    CAST((max(CASE WHEN i = 2 THEN v END) + max(CASE WHEN i = 3 THEN v END)
        |        + max(CASE WHEN i = 18 THEN v END) + max(CASE WHEN i = 19 THEN v END)) // 4 AS INT) AS rz2,
        |    CAST((max(CASE WHEN i = 4 THEN v END) + max(CASE WHEN i = 5 THEN v END)
        |        + max(CASE WHEN i = 20 THEN v END) + max(CASE WHEN i = 21 THEN v END)) // 4 AS INT) AS rz3,
        |    CAST((max(CASE WHEN i = 6 THEN v END) + max(CASE WHEN i = 7 THEN v END)
        |        + max(CASE WHEN i = 22 THEN v END) + max(CASE WHEN i = 23 THEN v END)) // 4 AS INT) AS rz4
        |  FROM b WHERE i < 24 GROUP BY doc_id
        |),
        |fm AS (
        |  SELECT doc_id,
        |    list_transform(
        |      range(0, (len + 63) // 64, 2),
        |      fi -> CAST(list_sum(list_transform(range(fi * 64, least(fi * 64 + 64, len)),
        |                   bi -> unicode(substr(text, CAST(bi + 1 AS INT), 1)))) AS BIGINT)::DOUBLE
        |            / least(64, len - fi * 64)) AS means
        |  FROM d
        |)
        |SELECT d.doc_id, 16 AS width, 16 AS height, d.len AS n_bytes,
        |       q.q1_mean, q.q2_mean, q.q3_mean, q.q4_mean,
        |       rz.rz1, rz.rz2, rz.rz3, rz.rz4,
        |       len(fm.means) AS n_frames,
        |       md5(array_to_string(list_transform(fm.means, m -> printf('%.6f', m)), ',')) AS frames_md5
        |FROM d JOIN q USING (doc_id) JOIN rz USING (doc_id) JOIN fm USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS blob_md5,
        |       md5(substr(text, 1, 64)) AS head_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors MultimodalOps.crossModalRetrieval end to end: the two stub
    // towers (32-byte band sums over the zero-padded 256-byte payload;
    // 8-bucket fh:-hashed BoW counts), the md5-derived integer alignment
    // heads (cmI/cmT, % 17 − 8), exact-BIGINT projections/dots/norms,
    // and the one shared IEEE cosine + row_number top-5. Missing text
    // buckets contribute 0 on both sides (dense-array fill in Spark ==
    // absent join rows under SUM here).
    "q_crossmodal_retrieval" ->
      """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents),
        |hI AS (
        |  SELECT j, dd,
        |    CAST(('0x' || substr(md5('cmI:' || j::VARCHAR || ':' || dd::VARCHAR), 1, 15)) AS BIGINT) % 17 - 8 AS wt
        |  FROM generate_series(0, 7) a(j), generate_series(0, 7) bb(dd)),
        |hT AS (
        |  SELECT j, dd,
        |    CAST(('0x' || substr(md5('cmT:' || j::VARCHAR || ':' || dd::VARCHAR), 1, 15)) AS BIGINT) % 17 - 8 AS wt
        |  FROM generate_series(0, 7) a(j), generate_series(0, 7) bb(dd)),
        |b AS (
        |  SELECT doc_id, i,
        |         CASE WHEN i < len THEN unicode(substr(text, CAST(i + 1 AS INT), 1)) ELSE 0 END AS v
        |  FROM d, generate_series(0, 255) t(i)),
        |iv AS (SELECT doc_id, i // 32 AS j, CAST(sum(v) AS BIGINT) AS f
        |       FROM b GROUP BY 1, 2),
        |iy AS (SELECT iv.doc_id, dd, CAST(sum(f * wt) AS BIGINT) AS y
        |       FROM iv JOIN hI ON hI.j = iv.j GROUP BY 1, 2),
        |inorm AS (SELECT doc_id, CAST(sum(y * y) AS BIGINT) AS n2
        |          FROM iy GROUP BY 1 HAVING n2 > 0),
        |tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |       FROM d WHERE doc_id % 200 = 3),
        |tc AS (SELECT doc_id,
        |         CAST(('0x' || substr(md5('fh:' || w), 1, 15)) AS BIGINT) % 8 AS j,
        |         CAST(count(*) AS BIGINT) AS c
        |       FROM tw GROUP BY 1, 2),
        |ty AS (SELECT tc.doc_id, dd, CAST(sum(c * wt) AS BIGINT) AS y
        |       FROM tc JOIN hT ON hT.j = tc.j GROUP BY 1, 2),
        |tnorm AS (SELECT doc_id, CAST(sum(y * y) AS BIGINT) AS qn2
        |          FROM ty GROUP BY 1 HAVING qn2 > 0),
        |dotp AS (
        |  SELECT ty.doc_id AS q_doc, iy.doc_id AS img_doc,
        |         CAST(sum(ty.y * iy.y) AS BIGINT) AS dp
        |  FROM ty JOIN iy ON ty.dd = iy.dd GROUP BY 1, 2),
        |cosd AS (
        |  SELECT q_doc, img_doc,
        |         dp::DOUBLE / (sqrt(qn2::DOUBLE) * sqrt(n2::DOUBLE)) AS c
        |  FROM dotp
        |  JOIN tnorm ON tnorm.doc_id = q_doc
        |  JOIN inorm ON inorm.doc_id = img_doc),
        |rk AS (
        |  SELECT q_doc, img_doc, c,
        |         row_number() OVER (PARTITION BY q_doc
        |           ORDER BY c DESC, img_doc ASC) AS rank
        |  FROM cosd)
        |SELECT q_doc, rank, img_doc, round(c, 3) AS cos
        |FROM rk WHERE rank <= 5 ORDER BY q_doc, rank""".stripMargin,

    // ---- EventStream (batch twin of the AvailableNow drain) ----
    // Mirrors EventStream.ingestStatsOf: content-dedup then per-lang
    // exact-integer stats. The stream's dropDuplicates keeps the first
    // arrival per digest; the twin keeps min doc_id — equivalent on any
    // fixture without content-identical docs carrying conflicting lang
    // labels (true at the sf0.01 gate: 500 rows, 500 distinct digests,
    // verified; at sf0.1 seven label-conflicted dup pairs exist as
    // fixture noise, documented in qStreamIngest).
    "q_stream_ingest" ->
      """WITH u AS (
        |  SELECT lang, n_chars, string_split(text, ' ') AS toks,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents
        |)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(CAST(round(len(list_distinct(toks))::DOUBLE / len(toks) * 1000000)
        |                     AS BIGINT)) AS BIGINT) AS q_micro,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM u WHERE rn = 1
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // ---- SimilarityOps ----
    "q_ann_bruteforce" -> ANN_BF,

    "q_ann_lsh" -> ANN_LSH,

    "q_ann_ivf" -> ANN_IVF,

    // Mirrors SimilarityOps.qAnnRecall: the four ANN oracles as
    // subqueries (per-pair left joins are ≤1:1, so count(*) stays k);
    // recall values are exact integer hit counts over one shared IEEE
    // division. The mean-recall floors are pinned as literal `true` —
    // a Spark-side recall regression below the floor fails the hash.
    "q_ann_recall" ->
      s"""WITH bf AS (SELECT q_id, neighbor_id FROM ($ANN_BF)),
         |ivf AS (SELECT q_id, neighbor_id FROM ($ANN_IVF)),
         |lsh AS (SELECT q_id, neighbor_id FROM ($ANN_LSH)),
         |ivfk AS (SELECT q_id, neighbor_id FROM ($ANN_IVF_KMEANS)),
         |qr AS (SELECT q_id, neighbor_id FROM ($ANN_QR)),
         |pq AS (SELECT q_id, neighbor_id FROM (${annPqSql(nprobe = 5)})),
         |adc AS (SELECT q_id, neighbor_id FROM (${annAdcSql(expand = 12)})),
         |h AS (
         |  SELECT bf.q_id, count(*) AS n_exact,
         |         CAST(count(i.neighbor_id) AS BIGINT) AS h_ivf,
         |         CAST(count(l.neighbor_id) AS BIGINT) AS h_lsh,
         |         CAST(count(k.neighbor_id) AS BIGINT) AS h_ivfk,
         |         CAST(count(r.neighbor_id) AS BIGINT) AS h_qr,
         |         CAST(count(p.neighbor_id) AS BIGINT) AS h_pq,
         |         CAST(count(a.neighbor_id) AS BIGINT) AS h_adc
         |  FROM bf
         |  LEFT JOIN ivf i ON i.q_id = bf.q_id AND i.neighbor_id = bf.neighbor_id
         |  LEFT JOIN lsh l ON l.q_id = bf.q_id AND l.neighbor_id = bf.neighbor_id
         |  LEFT JOIN ivfk k ON k.q_id = bf.q_id AND k.neighbor_id = bf.neighbor_id
         |  LEFT JOIN qr r ON r.q_id = bf.q_id AND r.neighbor_id = bf.neighbor_id
         |  LEFT JOIN pq p ON p.q_id = bf.q_id AND p.neighbor_id = bf.neighbor_id
         |  LEFT JOIN adc a ON a.q_id = bf.q_id AND a.neighbor_id = bf.neighbor_id
         |  GROUP BY bf.q_id
         |)
         |SELECT q_id, n_exact,
         |       round(CAST(h_ivf AS DOUBLE) / n_exact, 3) AS recall_ivf,
         |       round(CAST(h_lsh AS DOUBLE) / n_exact, 3) AS recall_lsh,
         |       round(CAST(h_ivfk AS DOUBLE) / n_exact, 3) AS recall_ivf_kmeans,
         |       round(CAST(h_qr AS DOUBLE) / n_exact, 3) AS recall_quant_rescore,
         |       round(CAST(h_pq AS DOUBLE) / n_exact, 3) AS recall_ivf_pq,
         |       round(CAST(h_adc AS DOUBLE) / n_exact, 3) AS recall_pq_adc,
         |       true AS ivf_mean_ok, true AS lsh_mean_ok, true AS ivf_kmeans_mean_ok,
         |       true AS quant_rescore_mean_ok, true AS ivf_pq_mean_ok,
         |       true AS pq_adc_mean_ok
         |FROM h ORDER BY q_id""".stripMargin,

    // DuckDB twin of the custom graft_sliding generator: lateral
    // generate_series over 1-based slice starts, stride 3, full windows
    // only (i + 4 <= len).
    "q_sliding_windows" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |idx AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(1, len(toks) - 4, 3)) AS i
        |  FROM t),
        |w AS (
        |  SELECT doc_id,
        |         array_to_string(list_slice(toks, i, i + 4), ' ') AS ws
        |  FROM idx)
        |SELECT doc_id, count(*) AS n_wins,
        |       count(DISTINCT ws) AS n_distinct,
        |       min(ws) AS first_win, max(ws) AS last_win
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // AND-semantics scored retrieval; idf is the integer-scaled rational
    // (N*10^6)//df — no log anywhere.
    "q_term_search" ->
      """WITH tf AS (
        |  SELECT doc_id, t.token, count(*) AS tf
        |  FROM documents, unnest(string_split(text, ' ')) AS t(token)
        |  WHERE t.token IN ('spark', 'join')
        |  GROUP BY 1, 2),
        |idf AS (
        |  SELECT token,
        |         ((SELECT count(*) FROM documents) * 1000000) // count(*)
        |           AS idf_s
        |  FROM tf GROUP BY token)
        |SELECT tf.doc_id,
        |       CAST(sum(tf.tf * idf.idf_s) AS BIGINT) AS score
        |FROM tf JOIN idf ON tf.token = idf.token
        |GROUP BY tf.doc_id
        |HAVING count(*) = 2
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // Exact order-statistic p25 cut (rank > floor(n/4) in
    // (n_chars, doc_id) order) — no interpolated percentile anywhere.
    "q_quantile_filter" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |         count(*) OVER (PARTITION BY lang) AS n_l,
        |         row_number() OVER
        |           (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn
        |  FROM documents)
        |SELECT lang, max(n_l) AS n_total, count(*) AS n_kept,
        |       min(n_chars) AS min_kept_chars,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_kept_chars
        |FROM ranked WHERE rn > n_l // 4
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Mirrors TextOps.qBm25: idf = ln((N-df+0.5)/(df+0.5)+1), contribution
    // tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with k1=1.2, b=0.75, rounded to
    // micro-points per (doc, term) BEFORE the per-doc sum — the total is
    // an exact BIGINT, order-independent on both engines.
    "q_bm25" ->
      """WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM lens),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t
        |       WHERE token IN ('spark', 'join', 'data') GROUP BY 1, 2),
        |idf AS (SELECT token, ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) AS idf,
        |               n_docs, total_dl
        |        FROM (SELECT token, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN stats),
        |c AS (
        |  SELECT tf.doc_id,
        |         CAST(round(idf.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / (CAST(idf.total_dl AS DOUBLE) / idf.n_docs))) * 1000000.0) AS BIGINT) AS contrib_micro
        |  FROM tf JOIN idf USING (token) JOIN lens USING (doc_id)
        |)
        |SELECT doc_id, CAST(sum(contrib_micro) AS BIGINT) AS score_micro,
        |       count(*) AS n_terms_hit
        |FROM c GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // Mirrors TextOps.qMrrEval: per-term BM25 contribution ranking,
    // relevance = tf >= 3, exact-integer reciprocal rank in ppm.
    "q_mrr_eval" ->
      """WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM lens),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t
        |       WHERE token IN ('spark', 'join', 'data') GROUP BY 1, 2),
        |idf AS (SELECT token, ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) AS idf,
        |               n_docs, total_dl
        |        FROM (SELECT token, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN stats),
        |c AS (
        |  SELECT tf.token, tf.doc_id, tf.tf,
        |         CAST(round(idf.idf * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / (CAST(idf.total_dl AS DOUBLE) / idf.n_docs))) * 1000000.0) AS BIGINT) AS score_micro
        |  FROM tf JOIN idf USING (token) JOIN lens USING (doc_id)),
        |r AS (
        |  SELECT token, doc_id, tf, score_micro,
        |         row_number() OVER (PARTITION BY token
        |                            ORDER BY score_micro DESC, doc_id) AS rn
        |  FROM c)
        |SELECT token, count(*) AS n_ranked,
        |       CAST(coalesce(min(CASE WHEN tf >= 3 THEN rn END), 0) AS BIGINT)
        |         AS first_rank,
        |       CAST(coalesce(1000000 // min(CASE WHEN tf >= 3 THEN rn END), 0)
        |         AS BIGINT) AS rr_ppm
        |FROM r WHERE rn <= 10 GROUP BY token ORDER BY token""".stripMargin,

    // Mirrors TextOps.qHllDistinct: 256-register HLL off the shared
    // 60-bit md5 hash; register maxima are exact integers, the harmonic
    // mean runs off exact BIGINT Z = sum 2^(53-Mj), and the only floats
    // are the shared alpha*m^2*2^53/Z expression + linear-counting branch.
    "q_hll_distinct" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |h AS (SELECT lang, token,
        |             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM t),
        |r AS (SELECT lang, h % 256 AS reg,
        |             CASE WHEN h // 256 = 0 THEN 53
        |                  ELSE 53 - length(regexp_replace(bin(h // 256), '^0+', '')) END AS rho
        |      FROM h),
        |mx AS (SELECT lang, reg, max(rho) AS mrho FROM r GROUP BY 1, 2),
        |sk AS (SELECT lang, count(*) AS n_hit,
        |              CAST(sum(1::BIGINT << CAST(53 - mrho AS INT)) AS BIGINT) AS z_hit
        |       FROM mx GROUP BY 1),
        |est AS (
        |  SELECT lang, n_hit,
        |         z_hit + (256 - n_hit) * (1::BIGINT << 53) AS z,
        |         256 - n_hit AS v
        |  FROM sk
        |), ee AS (
        |  SELECT lang, n_hit, v,
        |         0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * 9007199254740992.0 / z AS e_raw
        |  FROM est
        |), fin AS (
        |  SELECT lang, n_hit,
        |         CAST(round(CASE WHEN e_raw <= 2.5 * 256 AND v > 0
        |                         THEN 256 * ln(CAST(256 AS DOUBLE) / v)
        |                         ELSE e_raw END) AS BIGINT) AS est
        |  FROM ee
        |), ex AS (SELECT lang, count(DISTINCT token) AS exact_distinct FROM t GROUP BY 1)
        |SELECT fin.lang, fin.n_hit, fin.est, ex.exact_distinct,
        |       (abs(fin.est - ex.exact_distinct) * 5 <= ex.exact_distinct) AS within_20pct
        |FROM fin JOIN ex USING (lang) ORDER BY lang""".stripMargin,

    // Mirrors TextOps.qPerplexityFilter: per-bigram nll = ln(c1/c12)
    // rounded to micro-nats (exact BIGINT), per-doc exact sum + integer-
    // division average, fixed 5.0-nat keep threshold.
    "q_perplexity_filter" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bgl AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |                i -> {'w1': w[i], 'w2': w[i+1]})) AS b FROM d),
        |bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bgl),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |nll AS (SELECT c12.w1, c12.w2,
        |               CAST(round(ln(CAST(c1.c1 AS DOUBLE) / c12.c12) * 1000000.0) AS BIGINT) AS nll_micro
        |        FROM c12 JOIN c1 USING (w1)),
        |s AS (SELECT bg.doc_id, CAST(sum(nll_micro) AS BIGINT) AS tot,
        |             count(*) AS n_bigrams
        |      FROM bg JOIN nll USING (w1, w2) GROUP BY 1)
        |SELECT doc_id, n_bigrams, tot AS nll_total_micro,
        |       tot // n_bigrams AS avg_nll_micro,
        |       (tot // n_bigrams <= 3420000) AS keep_doc
        |FROM s ORDER BY doc_id""".stripMargin,

    // Mirrors TextOps.qPrioritySample: priority = hash60/weight, smallest
    // 100 win; ranked on the unrounded IEEE division both engines share.
    "q_priority_sample" ->
      """WITH p AS (
        |  SELECT doc_id, lang, n_chars,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)::DOUBLE
        |           / n_chars AS prio
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT doc_id, lang, n_chars, round(prio, 6) AS prio
        |FROM p ORDER BY p.prio, doc_id LIMIT 100""".stripMargin,

    // Mirrors TextOps.qPmiCollocations: exact bigram counts + directional
    // marginals, ln only at the end, ranked on the rounded score.
    "q_pmi_collocations" ->
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |bgl AS (SELECT unnest(list_transform(range(1, len(w)),
        |                i -> {'w1': w[i], 'w2': w[i+1]})) AS b FROM d),
        |p AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bgl),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
        |c2 AS (SELECT w2, count(*) AS c2 FROM p GROUP BY 1),
        |nb AS (SELECT count(*) AS nb FROM p)
        |SELECT w1, w2, c12,
        |       round(ln(c12::DOUBLE * nb / (c1::DOUBLE * c2)), 6) AS pmi
        |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nb
        |WHERE c12 >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    // Mirrors SimilarityOps.knnGraph: 8 md5 planes, every vector probes
    // its Hamming-<=3 buckets (93 masks), bucket equi-join candidates,
    // top-5 by (cos desc, neighbor_id). The 8/3 point is the numpy
    // sweep's knee: recall@5 0.60 at 37% candidates (vs 0.32 at H<=2);
    // the same finer-buckets+wider-probes operating point as annLsh.
    "q_knn_graph" ->
      s"""$KNN8
         |SELECT q_id, rank, neighbor_id, round(cos, 3) AS cos
         |FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    // Mirrors SimilarityOps.labelSmooth: majority label over the same
    // kNN edge relation; ties → most votes then smallest label id
    // (row_number ↔ Spark's max_by struct(n_votes, -n_label)).
    "q_label_smooth" ->
      s"""$KNN8,
         |nb AS (
         |  SELECT r.q_id, e2.label AS n_label
         |  FROM r JOIN embeddings e2 ON e2.vec_id = r.neighbor_id
         |  WHERE r.rank <= 5
         |), v AS (
         |  SELECT q_id, n_label, count(*) AS n_votes FROM nb GROUP BY 1, 2
         |), s AS (
         |  SELECT q_id, n_label AS smoothed_label, n_votes AS n_agree,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY n_votes DESC, n_label ASC) AS rn
         |  FROM v
         |)
         |SELECT emb.vec_id, emb.label, s.smoothed_label, s.n_agree,
         |       CASE WHEN emb.label <> s.smoothed_label THEN 1 ELSE 0 END AS changed
         |FROM s JOIN embeddings emb ON emb.vec_id = s.q_id
         |WHERE s.rn = 1 ORDER BY emb.vec_id""".stripMargin,

    // Mirrors DedupOps.containmentPairs: A-prefix (|A|-ceil(0.85|A|)+1
    // smallest hashes) probed against the FULL df-capped inverted index,
    // exact containment |A∩B|/|A| verified on the hash-set signatures.
    // Hashed sets on both sides (the ngram NOTE's collision-surfacing
    // asymmetry is already covered by q_dedup_ngram_jaccard).
    "q_containment_dedup" ->
      s"""$SH,
         |hsig AS (
         |  SELECT doc_id, lang,
         |         list_sort(list_distinct(list(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS hset
         |  FROM sh GROUP BY doc_id, lang
         |), pfx AS (
         |  SELECT doc_id, lang,
         |         unnest(list_slice(hset, 1, CAST(len(hset) - ceil(len(hset) * 0.85 - 1e-9) + 1 AS INT))) AS h
         |  FROM hsig
         |), hfull AS (
         |  SELECT doc_id, lang, unnest(hset) AS h FROM hsig
         |), fdf AS (
         |  SELECT lang, h FROM hfull GROUP BY lang, h HAVING count(*) <= 50
         |), hrare AS (
         |  SELECT f.doc_id, f.lang, f.h
         |  FROM hfull f JOIN fdf ON fdf.lang = f.lang AND fdf.h = f.h
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM pfx a JOIN hrare b
         |    ON a.h = b.h AND a.lang = b.lang AND a.doc_id <> b.doc_id
         |)
         |SELECT c.doc_a, c.doc_b,
         |       round(len(list_intersect(sa.hset, sb.hset))::DOUBLE / len(sa.hset), 6) AS containment
         |FROM cand c
         |JOIN hsig sa ON sa.doc_id = c.doc_a
         |JOIN hsig sb ON sb.doc_id = c.doc_b
         |WHERE round(len(list_intersect(sa.hset, sb.hset))::DOUBLE / len(sa.hset), 6) >= 0.85
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Mirrors SimilarityOps.semanticDedup: the q_kmeans centroid CTEs
    // (md5-seeded codebook, exact integer micro-unit Lloyd update,
    // (dist, c_id) argmin re-assignment), then within-cluster pairs at
    // 3dp-rounded cosine >= 0.45 drop the higher vec_id.
    "q_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |ew AS (SELECT vec_id, v, list_dot_product(v, v) AS nv FROM e),
        |c0 AS (SELECT * FROM (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS ck FROM e)
        |       ORDER BY ck LIMIT 8),
        |cw AS (SELECT CAST(row_number() OVER (ORDER BY ck) - 1 AS BIGINT) AS c_id, v AS cv,
        |              list_dot_product(v, v) AS nc FROM c0),
        |a1 AS (
        |  SELECT vec_id, v, c_id FROM (
        |    SELECT ew.vec_id, ew.v, cw.c_id,
        |           row_number() OVER (PARTITION BY ew.vec_id
        |             ORDER BY ew.nv - 2 * list_dot_product(ew.v, cw.cv) + cw.nc, cw.c_id) AS rn
        |    FROM ew CROSS JOIN cw) WHERE rn = 1
        |),
        |dims AS (
        |  SELECT c_id, j AS pos, SUM(CAST(round(v[j] * 1000000.0) AS BIGINT)) AS s, count(*) AS n
        |  FROM a1, generate_series(1, 64) t(j) GROUP BY 1, 2
        |),
        |cm AS (SELECT c_id, pos, CAST(floor(s / (n::DOUBLE) + 0.5) AS BIGINT) AS cm FROM dims),
        |c1 AS (
        |  SELECT c_id, list(cm::DOUBLE / 1000000.0 ORDER BY pos) AS cv
        |  FROM cm GROUP BY c_id
        |),
        |cw2 AS (SELECT c_id, cv, list_dot_product(cv, cv) AS nc FROM c1),
        |a2 AS (
        |  SELECT vec_id, c_id FROM (
        |    SELECT ew.vec_id, cw2.c_id,
        |           row_number() OVER (PARTITION BY ew.vec_id
        |             ORDER BY ew.nv - 2 * list_dot_product(ew.v, cw2.cv) + cw2.nc, cw2.c_id) AS rn
        |    FROM ew CROSS JOIN cw2) WHERE rn = 1
        |),
        |av AS (SELECT a2.vec_id, a2.c_id, ew.v, ew.nv FROM a2 JOIN ew USING (vec_id)),
        |pr AS (
        |  SELECT a.c_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         round(list_dot_product(a.v, b.v) / (sqrt(a.nv) * sqrt(b.nv)), 3) AS cos
        |  FROM av a JOIN av b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
        |),
        |dropped AS (SELECT DISTINCT c_id, vec_b FROM pr WHERE cos >= 0.45),
        |m AS (SELECT c_id, count(*) AS n_members FROM av GROUP BY 1),
        |dd AS (SELECT c_id, count(*) AS n_dropped FROM dropped GROUP BY 1)
        |SELECT m.c_id, m.n_members,
        |       coalesce(dd.n_dropped, 0) AS n_dropped,
        |       m.n_members - coalesce(dd.n_dropped, 0) AS n_kept
        |FROM m LEFT JOIN dd USING (c_id) ORDER BY m.c_id""".stripMargin,

    "q_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
        |  ORDER BY cnt DESC, token LIMIT 64)
        |SELECT lang, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000000 // count(*) AS oov_ppm
        |FROM tok t LEFT JOIN vocab v USING (token)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Independent formulation of TextOps.qWinnowFingerprint (k=3 word
    // grams, w=4 windows, leftmost-min (h, pos) selection, full windows
    // only): a windowed self-join with the (h, offset) order packed into
    // ONE BIGINT — h·4 + (pos − wstart) compares primarily on h (offset
    // < 4), so min() is the lexicographic (h, pos) minimum, exactly.
    // (A min-over-STRUCT window would mirror the Spark plan 1:1, but
    // DuckDB's windowed struct min does not reduce over the frame —
    // verified against a driver brute force — so the oracle uses this
    // join form instead, which doubles as a genuinely independent check.)
    "q_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks) - 2)) AS pos,
        |         toks
        |  FROM t WHERE len(toks) >= 6),
        |h AS (
        |  SELECT doc_id, pos, len(toks) - 2 AS nk,
        |         CAST(('0x' || substr(md5(toks[pos] || ' ' || toks[pos+1]
        |              || ' ' || toks[pos+2]), 1, 15)) AS BIGINT) AS h
        |  FROM g),
        |sel AS (
        |  SELECT a.doc_id,
        |         a.pos + min(b.h * 4 + (b.pos - a.pos)) % 4 AS sel_pos,
        |         min(b.h * 4 + (b.pos - a.pos)) // 4 AS fp60
        |  FROM h a JOIN h b ON a.doc_id = b.doc_id
        |                    AND b.pos >= a.pos AND b.pos <= a.pos + 3
        |  WHERE a.pos <= a.nk - 3
        |  GROUP BY a.doc_id, a.pos)
        |SELECT DISTINCT doc_id, sel_pos, fp60
        |FROM sel ORDER BY doc_id, sel_pos""".stripMargin,

    "q_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id,
        |         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 2)) AS i
        |        FROM t WHERE len(toks) >= 3)),
        |df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_unique,
        |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         * 1000000 // count(*) AS novelty_ppm
        |FROM g JOIN df USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dataset_card" ->
      """WITH sl AS (
        |  SELECT source, lang, count(*) AS nl,
        |         CAST(sum(n_chars) AS BIGINT) AS chars_l,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks_l
        |  FROM documents GROUP BY 1, 2),
        |top AS (
        |  SELECT source, lang AS top_lang FROM (
        |    SELECT source, lang,
        |           row_number() OVER (PARTITION BY source
        |                              ORDER BY nl DESC, lang) AS rn
        |    FROM sl) WHERE rn = 1)
        |SELECT sl.source, CAST(sum(nl) AS BIGINT) AS n_docs,
        |       CAST(sum(chars_l) AS BIGINT) AS tot_chars,
        |       CAST(sum(chars_l) // sum(nl) AS BIGINT) AS mean_chars,
        |       count(*) AS n_langs,
        |       max(top.top_lang) AS top_lang,
        |       CAST(sum(toks_l) AS BIGINT) AS tot_tokens
        |FROM sl JOIN top ON sl.source = top.source
        |GROUP BY sl.source ORDER BY sl.source""".stripMargin,
  )
}
