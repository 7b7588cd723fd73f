package graft.ops

/** DuckDB twins for [[ScrubOps]]. The PII `raw` synthesis and the regex
  * patterns are mirrored literally; DuckDB's `regexp_replace` needs the
  * explicit 'g' flag to match Spark's replace-all semantics. Paragraph
  * slicing uses DuckDB's clamping 1-based list slice, which matches
  * Spark's `slice(toks, start, len)` on the short final paragraph.
  */
object ScrubOracles {
  private val raw =
    "text || ' contact user' || doc_id || '@mail.example.com or +1-555-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
      "CASE WHEN doc_id % 2 = 0 THEN ' alt z' || doc_id || '@alt.net' ELSE '' END"

  private val emailPat = "[a-z0-9._]+@[a-z0-9.]+"
  private val phonePat = "\\+1-[0-9]{3}-[0-9]{4}"

  val all: Map[String, String] = Map(
    "q_pii_redact" ->
      s"""WITH d AS (SELECT doc_id, $raw AS raw FROM documents),
        |r AS (SELECT doc_id, raw,
        |  regexp_replace(regexp_replace(raw, '$emailPat', '<EMAIL>', 'g'),
        |                 '$phonePat', '<PHONE>', 'g') AS redacted
        |  FROM d)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '$emailPat')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '$phonePat')) AS INT) AS n_phones,
        |  CAST(strlen(redacted) AS INT) AS redacted_len,
        |  md5(redacted) AS redacted_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract('https://' || source || '.example.org/d/' || doc_id,
        |                   'https://([a-z0-9.]+)/', 1) AS domain
        |  FROM documents)
        |SELECT domain, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM u
        |WHERE domain NOT IN ('src0.example.org', 'src7.example.org',
        |                     'src13.example.org')
        |GROUP BY domain ORDER BY domain""".stripMargin,

    "q_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, CAST(i AS INT) AS pid,
        |         md5(array_to_string(toks[(i * 10 + 1):(i * 10 + 10)], ' ')) AS para_md5
        |  FROM t, unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS u(i)),
        |r AS (
        |  SELECT doc_id,
        |         row_number() OVER (PARTITION BY para_md5 ORDER BY doc_id, pid) AS rn
        |  FROM p)
        |SELECT doc_id, count(*) AS n_paras,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
        |  round((count(*) - SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END))
        |          / CAST(count(*) AS DOUBLE), 6) AS kept_ratio
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Mirrors ScrubOps.qForgetCascade: every phase count is closed-form
    // over the base tables. Keyed/vstore legs count documents; the ANN
    // leg counts posting rows = 2 per member (nassign=2 of 16 cells,
    // always exactly two), members being the amax>0 vectors. The
    // pre-forget version still reads the full table (vacuum is the
    // erasure boundary); re-forget phases equal the forgotten state.
    "q_forget_cascade" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM documents
        |      WHERE doc_id % 10 <> 3),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS ne FROM embeddings
        |       WHERE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0),
        |me AS (SELECT CAST(count(*) AS BIGINT) AS me FROM embeddings
        |       WHERE vec_id % 10 <> 3
        |         AND list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0),
        |sb AS (SELECT CAST(coalesce(sum(len(string_split(text, ' '))), 0)
        |         AS BIGINT) AS sb
        |       FROM documents WHERE doc_id % 21 = 0),
        |sa AS (SELECT CAST(coalesce(sum(len(string_split(text, ' '))), 0)
        |         AS BIGINT) AS sa
        |       FROM documents WHERE doc_id % 21 = 0 AND doc_id % 10 <> 3)
        |SELECT * FROM (
        |  SELECT 'keyed' AS leg, 'before' AS phase, n AS n_rows FROM n
        |  UNION ALL SELECT 'keyed', 'after', m FROM m
        |  UNION ALL SELECT 'vstore', 'pre_forget_version', n FROM n
        |  UNION ALL SELECT 'vstore', 'head_after', m FROM m
        |  UNION ALL SELECT 'ann', 'postings_before', 2 * ne FROM ne
        |  UNION ALL SELECT 'ann', 'postings_after', 2 * me FROM me
        |  UNION ALL SELECT 'suffix', 'before', sb FROM sb
        |  UNION ALL SELECT 'suffix', 'after', sa FROM sa
        |) ORDER BY leg, phase""".stripMargin,
  )
}
