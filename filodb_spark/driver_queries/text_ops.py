"""Driver queries: text analysis + deduplication over `documents`."""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.operators import dedup, text


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_doc_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


def q_doc_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))


def q_doc_subword_count(spark, sf_dir):
    # BPE-ish regex pre-tokenizer count (GPT-2 split-pattern shape)
    d = _docs(spark, sf_dir)
    return d.select("doc_id",
                    text.subword_count(F.col("text")).alias("n_subwords"))


def q_doc_rolling_fp(spark, sf_dir):
    # rolling-hash (Rabin-Karp min over char 8-grams) fingerprint —
    # plain modular arithmetic, reproduced exactly by the SQL oracle
    d = _docs(spark, sf_dir)
    return d.select("doc_id",
                    text.rolling_fingerprint(F.col("text")).alias("fp"))


def q_doc_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_actual"),
        text.token_count(t).alias("n_tokens"),
        F.round(text.stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(text.avg_word_len(t), 6).alias("awl"),
        F.round(text.quality_score(t), 6).alias("quality"),
    )


def q_doc_langid(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scores = text.lang_scores(F.col("text"))
    return d.select(
        "doc_id", text.lang_id(F.col("text")).alias("lang_guess"),
        *[F.round(scores[lang], 6).alias(f"score_{lang}")
          for lang in sorted(text.LANG_MARKERS)])


def q_doc_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.7,
                                     bucket_cols=("lang", "source"))


def q_doc_dedup_clusters(spark, sf_dir):
    """Near-duplicate clustering: blocked exact Jaccard pairs (>= 0.4)
    -> connected components (min-id label propagation) -> one canonical
    cluster id per paired document. The oracle recomputes components via
    a recursive transitive-closure CTE."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.4,
                                      bucket_cols=("lang", "source"))
    return dedup.dedup_clusters(pairs)


def q_doc_dedup_summary(spark, sf_dir):
    """Full dedup pipeline in one number set: pairs -> clusters -> keep
    one canonical doc per cluster. Output: corpus size, paired docs,
    clusters, docs removed, docs kept."""
    d = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.4,
                                      bucket_cols=("lang", "source"))
    clusters = dedup.dedup_clusters(pairs)
    stats = clusters.agg(
        F.count(F.lit(1)).alias("n_paired"),
        F.count_distinct("cluster_id").alias("n_clusters"))
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (total.crossJoin(stats)
            .withColumn("n_removed", F.col("n_paired") - F.col("n_clusters"))
            .withColumn("n_kept", F.col("n_docs") - F.col("n_removed"))
            .select("n_docs", "n_paired", "n_clusters", "n_removed",
                    "n_kept"))


def q_doc_split(spark, sf_dir):
    """Deterministic train/val/test assignment (md5-bucket hash, 90/5/5)
    reported per language — shows the split is stratified-stable."""
    d = text.assign_split(_docs(spark, sf_dir))
    return d.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n"))


def q_doc_tfidf_topk(spark, sf_dir):
    """Top-5 TF-IDF terms per document (broadcast doc-frequency join,
    bounded per-doc window)."""
    return text.tfidf_topk(_docs(spark, sf_dir), k=5)


def q_doc_minhash_lsh(spark, sf_dir):
    # approximate — no SQL oracle (driver records rows-only check)
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_doc_minhash_portable(spark, sf_dir):
    """MinHash+LSH on the engine-portable hash (md5 + Mersenne-31
    universal permutations): the full approximate pipeline — signatures,
    band keys, collision join, similarity estimate — reproduced
    bit-exactly by the SQL oracle."""
    return dedup.minhash_lsh_pairs_portable(_docs(spark, sf_dir),
                                            threshold=0.5)


def q_doc_simhash_portable(spark, sf_dir):
    """SimHash on the portable 31-bit hash — exact SQL oracle."""
    return dedup.simhash_portable(_docs(spark, sf_dir))


def q_doc_lsh_verify(spark, sf_dir):
    """Two-phase near-dup: portable-LSH candidates (est >= 0.2) verified
    with TRUE 3-gram Jaccard (>= 0.5) — candidates only, never all
    pairs; exact SQL oracle for the full composition."""
    return dedup.lsh_verified_pairs(_docs(spark, sf_dir))


def q_doc_simhash(spark, sf_dir):
    # 64-bit signed-projection hash per doc (xxhash64-based — not
    # reproducible in the SQL oracle; rows-only check)
    return dedup.simhash(_docs(spark, sf_dir))


CHUNK_TOKENS, CHUNK_STRIDE = 16, 12


def q_doc_chunks(spark, sf_dir):
    """Overlapping context-window chunking (16-token windows, stride 12):
    the retrieval/embedding chunking stage. Map-only explode."""
    return text.chunk_documents(_docs(spark, sf_dir),
                                chunk_tokens=CHUNK_TOKENS,
                                stride=CHUNK_STRIDE)


def q_doc_segment_dedup(spark, sf_dir):
    """Sub-document exact dedup over deterministic 10-token segments
    (first occurrence survives), with a fingerprint of the reassembled
    text."""
    return dedup.segment_dedup(_docs(spark, sf_dir), seg_tokens=10)


def q_doc_unigram_lp(spark, sf_dir):
    """Add-one-smoothed corpus-unigram mean log-prob per doc — the
    perplexity-filter stand-in."""
    return text.unigram_logprob(_docs(spark, sf_dir))


def q_doc_bigram_lp(spark, sf_dir):
    """Add-one-smoothed corpus-BIGRAM conditional mean log-prob per doc
    — the order-2 LM filter (catches common words in impossible
    orders)."""
    return text.bigram_logprob(_docs(spark, sf_dir))


def q_doc_dedup_keep(spark, sf_dir):
    """The dedup pipeline's OUTPUT artifact: the keep-list — every doc
    that is either unpaired or the canonical (min-id) member of its
    near-dup cluster. Downstream stages consume exactly this frame."""
    d = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(d, threshold=0.4,
                                      bucket_cols=("lang", "source"))
    clusters = dedup.dedup_clusters(pairs)
    dropped = clusters.where(F.col("doc_id") != F.col("cluster_id")) \
        .select("doc_id")
    return (d.join(dropped, "doc_id", "left_anti")
            .select("doc_id", "lang", "source"))


def q_doc_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility panel: BPE-ish subwords per whitespace word,
    per (lang, source) — the signal that flags scripts/domains a
    tokenizer fragments badly (high fertility = wasted context)."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    per_doc = d.select(
        "lang", "source",
        text.subword_count(t).alias("n_sub"),
        text.token_count(t).alias("n_tok"))
    return (per_doc.groupBy("lang", "source")
            .agg(F.sum("n_sub").cast("long").alias("subwords"),
                 F.sum("n_tok").cast("long").alias("words"),
                 F.round(F.sum("n_sub") / F.sum("n_tok"), 6)
                 .alias("fertility")))


def q_doc_split_leakage(spark, sf_dir):
    """Near-dup pairs (portable MinHash) straddling train/val/test —
    the leakage audit after deterministic splitting."""
    from filodb_spark.operators.pipeline import split_leakage
    return split_leakage(_docs(spark, sf_dir), threshold=0.5)


QUERIES = {
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_split_leakage": q_doc_split_leakage,
    "doc_chunks": q_doc_chunks,
    "doc_segment_dedup": q_doc_segment_dedup,
    "doc_unigram_lp": q_doc_unigram_lp,
    "doc_bigram_lp": q_doc_bigram_lp,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_token_count": q_doc_token_count,
    "doc_subword_count": q_doc_subword_count,
    "doc_rolling_fp": q_doc_rolling_fp,
    "doc_stats": q_doc_stats,
    "doc_langid": q_doc_langid,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_dedup_clusters": q_doc_dedup_clusters,
    "doc_dedup_summary": q_doc_dedup_summary,
    "doc_split": q_doc_split,
    "doc_tfidf_topk": q_doc_tfidf_topk,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_minhash_portable": q_doc_minhash_portable,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_portable": q_doc_simhash_portable,
    "doc_lsh_verify": q_doc_lsh_verify,
    "doc_dedup_keep": q_doc_dedup_keep,
    "doc_tokenizer_fertility": q_doc_tokenizer_fertility,
}

_STOP_SQL = "x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to' OR x = 'in'"

ORACLES = {
    "doc_dedup_exact":
        "SELECT min(doc_id) AS doc_id, count(*) AS n FROM documents GROUP BY text",
    "doc_fingerprint": r"""
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
FROM documents""",
    # SQL literal: each ' in the regex doubles ('' = one quote char)
    "doc_subword_count": r"""
SELECT doc_id,
       len(regexp_extract_all(text,
           '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +')) AS n_subwords
FROM documents""",
    "doc_rolling_fp": """
WITH d AS (SELECT doc_id, lower(text) AS lt FROM documents)
SELECT doc_id,
       CASE WHEN length(trim(lt)) >= 8 THEN
         list_min(list_transform(
           generate_series(1, length(lt) - 7),
           i -> list_reduce(
                  list_transform(generate_series(i, i + 7),
                                 j -> CAST(ascii(substring(lt, j, 1)) AS BIGINT)),
                  (acc, c) -> (acc * 257 + c) % 1000000007)))
       END AS fp
FROM d""",
    "doc_token_count": r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
FROM documents""",
    "doc_stats": r"""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars_actual,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> """ + _STOP_SQL + r""")) AS n_stop,
         length(regexp_replace(trim(text), '\s+', '', 'g')) AS nonspace
  FROM documents
)
SELECT doc_id, n_chars_actual, n_tokens,
       round(n_stop / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
       round(nonspace / CAST(n_tokens AS DOUBLE), 6) AS awl,
       round(least(1.0, n_tokens / 100.0) *
             (CASE WHEN nonspace / CAST(n_tokens AS DOUBLE) >= 3.0
                    AND nonspace / CAST(n_tokens AS DOUBLE) <= 8.0
                   THEN 1.0 ELSE 0.5 END), 6) AS quality
FROM s""",
    "doc_langid": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n
  FROM documents
),
sc AS (
  SELECT doc_id,
    len(list_filter(tk, x -> x IN ('the','and','of','to','a'))) / n AS s_en,
    len(list_filter(tk, x -> x IN ('der','die','und','ist','das'))) / n AS s_de,
    len(list_filter(tk, x -> x IN ('le','la','et','les','des'))) / n AS s_fr,
    len(list_filter(tk, x -> x IN ('el','los','que','y','las'))) / n AS s_es
  FROM toks
)
SELECT doc_id,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS lang_guess,
  round(s_de, 6) AS score_de, round(s_en, 6) AS score_en,
  round(s_es, 6) AS score_es, round(s_fr, 6) AS score_fr
FROM sc""",
}


def _jaccard_ctes(threshold: float) -> str:
    """Shared CTE block: blocked exact n-gram Jaccard pairs >= threshold
    (mirrors dedup.ngram_jaccard_pairs bit-for-bit)."""
    return f"""
sh AS (
  SELECT doc_id, lang, source,
         unnest(list_distinct(list_transform(
           generate_series(0, length(lower(text)) - 3),
           i -> substring(lower(text), i + 1, 3)))) AS g
  FROM documents WHERE length(text) >= 3
),
cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM sh a JOIN sh b
    ON a.g = b.g AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2,
         round(inter / CAST(c1.c + c2.c - inter AS DOUBLE), 6) AS jaccard
  FROM common
  JOIN cnt c1 ON c1.doc_id = d1
  JOIN cnt c2 ON c2.doc_id = d2
  WHERE round(inter / CAST(c1.c + c2.c - inter AS DOUBLE), 6) >= {threshold}
)"""


ORACLES["doc_ngram_jaccard"] = \
    "WITH " + _jaccard_ctes(0.7) + "\nSELECT d1, d2, jaccard FROM pairs"

ORACLES["doc_dedup_clusters"] = "WITH RECURSIVE " + _jaccard_ctes(0.4) + """,
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
)
SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n"""

ORACLES["doc_dedup_summary"] = "WITH RECURSIVE " + _jaccard_ctes(0.4) + """,
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
clusters AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
stats AS (
  SELECT count(*) AS n_paired, count(DISTINCT cluster_id) AS n_clusters
  FROM clusters
)
SELECT (SELECT count(*) FROM documents) AS n_docs,
       n_paired, n_clusters,
       n_paired - n_clusters AS n_removed,
       (SELECT count(*) FROM documents) - (n_paired - n_clusters) AS n_kept
FROM stats"""

ORACLES["doc_split"] = """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n
FROM b GROUP BY 1, 2"""

def _portable_hash_ctes(n: int) -> str:
    """Shingles (char n-grams, distinct) + the portable 31-bit hash —
    mirrors dedup._portable_shingle_hash/char_shingles bit-for-bit."""
    return f"""
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(0, length(lower(text)) - {n}),
           i -> substring(lower(text), i + 1, {n})))) AS g
  FROM documents WHERE length(text) >= {n}
),
h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
           % 2147483647 AS h
  FROM sh
)"""


def _minhash_portable_sql(num_perm: int = 16, bands: int = 4,
                          threshold: float = 0.5, n: int = 5) -> str:
    from filodb_spark.operators.dedup import MERSENNE31, _perm_coeffs
    rows = num_perm // bands
    mins = ",\n         ".join(
        f"min((h * {a} + {b}) % {MERSENNE31}) AS m{i}"
        for i, (a, b) in ((i, _perm_coeffs(i)) for i in range(num_perm)))
    banded = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, concat_ws('_', "
        + ", ".join(f"m{b * rows + r}" for r in range(rows))
        + ") AS bk FROM sig" for b in range(bands))
    matches = " + ".join(
        f"(CASE WHEN s1.m{i} = s2.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    return "WITH " + _portable_hash_ctes(n) + f""",
sig AS (
  SELECT doc_id,
         {mins}
  FROM h GROUP BY doc_id
),
banded AS (
  {banded}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT d1, d2,
       round(({matches}) / {float(num_perm)}, 6) AS est_jaccard
FROM cand JOIN sig s1 ON s1.doc_id = d1 JOIN sig s2 ON s2.doc_id = d2
WHERE round(({matches}) / {float(num_perm)}, 6) >= {threshold}"""


def _simhash_portable_sql(bits: int = 31, n: int = 4) -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits))
    mask = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits))
    return "WITH " + _portable_hash_ctes(n) + f""",
agg AS (
  SELECT doc_id,
         {sums}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({mask} AS BIGINT) AS simhash FROM agg"""


ORACLES["doc_minhash_portable"] = _minhash_portable_sql()
ORACLES["doc_simhash_portable"] = _simhash_portable_sql()

# composition: the full portable-MinHash pipeline as a subquery (DuckDB
# allows WITH inside a parenthesized subselect), joined to the md5
# split buckets — mirrors operators.pipeline.split_leakage
ORACLES["doc_split_leakage"] = f"""
WITH pr AS (SELECT * FROM ({_minhash_portable_sql()}) mh),
sp AS (
  SELECT doc_id,
         CASE WHEN CAST(concat('0x',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10000 < 9000 THEN 'train'
              WHEN CAST(concat('0x',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10000 < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT d1, d2, est_jaccard, s1.split AS split1, s2.split AS split2
FROM pr
JOIN sp s1 ON s1.doc_id = pr.d1
JOIN sp s2 ON s2.doc_id = pr.d2
WHERE s1.split <> s2.split"""

# whitespace tokens of the ORIGINAL-case text (chunking keeps case)
_TOK_RAW = r"""
  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\s+')
                 END AS t
  FROM documents
"""

ORACLES["doc_chunks"] = f"""
WITH tok AS ({_TOK_RAW}),
c AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) = 0 THEN 0
              WHEN len(t) <= {CHUNK_TOKENS} THEN 1
              ELSE CAST(floor((len(t) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                              / {float(CHUNK_STRIDE)}) AS BIGINT) + 1
         END AS nc
  FROM tok),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(0, nc), j -> {{
             'chunk_idx': j,
             'chunk_text': array_to_string(
                 t[j*{CHUNK_STRIDE}+1 : j*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' '),
             'n_tok': least({CHUNK_TOKENS}, n - j*{CHUNK_STRIDE})}})) AS ch
  FROM c)
SELECT doc_id, ch.chunk_idx AS chunk_idx, ch.chunk_text AS chunk_text,
       CAST(ch.n_tok AS BIGINT) AS n_tok
FROM g"""

ORACLES["doc_segment_dedup"] = f"""
WITH tok AS ({_TOK_RAW}),
c AS (SELECT doc_id, t, len(t) AS n,
             CAST(ceil(len(t) / 10.0) AS BIGINT) AS ns FROM tok),
segs AS (
  SELECT doc_id,
         unnest(list_transform(range(0, ns), j -> {{
             'seg_idx': j,
             'seg': array_to_string(t[j*10+1 : j*10+10], ' ')}})) AS s
  FROM c),
e AS (SELECT doc_id, s.seg_idx AS seg_idx, s.seg AS seg,
             md5(lower(s.seg)) AS h FROM segs),
r AS (SELECT *, row_number() OVER (PARTITION BY h
                                   ORDER BY doc_id, seg_idx) AS rn FROM e),
p AS (SELECT doc_id, count(*) AS n_seg,
             count(*) FILTER (WHERE rn = 1) AS n_kept,
             md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                          FILTER (WHERE rn = 1), '')) AS clean_fp
      FROM r GROUP BY doc_id)
SELECT d.doc_id, coalesce(p.n_seg, 0) AS n_seg,
       coalesce(p.n_kept, 0) AS n_kept,
       coalesce(p.clean_fp, md5('')) AS clean_fp
FROM documents d LEFT JOIN p USING (doc_id)"""

ORACLES["doc_unigram_lp"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM vocab),
sc AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
         round(sum(tf * ln((c + 1) / CAST(total + v AS DOUBLE))) / sum(tf), 6)
           AS avg_logprob
  FROM tf JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY doc_id)
SELECT d.doc_id, coalesce(sc.n_tok, 0) AS n_tok, sc.avg_logprob
FROM documents d LEFT JOIN sc USING (doc_id)"""

ORACLES["doc_tfidf_topk"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * ln((SELECT nd FROM n) / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= 5"""

# two-phase dedup: the full portable-MinHash pipeline as the candidate
# subquery, TRUE Jaccard over the SAME 5-gram shingle set computed only
# for those pairs (verify features == signature features by design)
ORACLES["doc_lsh_verify"] = f"""
WITH cand AS (
  SELECT d1, d2 FROM ({_minhash_portable_sql(threshold=0.2)}) mh
),
sh3 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(0, length(lower(text)) - 5),
           i -> substring(lower(text), i + 1, 5)))) AS g
  FROM documents WHERE length(text) >= 5
),
cnt AS (SELECT doc_id, count(*) AS c FROM sh3 GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, count(*) AS inter
  FROM cand c JOIN sh3 a ON a.doc_id = c.d1
              JOIN sh3 b ON b.doc_id = c.d2 AND b.g = a.g
  GROUP BY c.d1, c.d2
)
SELECT i.d1, i.d2,
       round(i.inter / CAST(c1.c + c2.c - i.inter AS DOUBLE), 6) AS jaccard
FROM inter i JOIN cnt c1 ON c1.doc_id = i.d1
             JOIN cnt c2 ON c2.doc_id = i.d2
WHERE round(i.inter / CAST(c1.c + c2.c - i.inter AS DOUBLE), 6) >= 0.5"""

ORACLES["doc_bigram_lp"] = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
bg AS (
  SELECT doc_id, u.w1, u.w2
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> {'w1': t[i], 'w2': t[i + 1]})) AS u
        FROM toks WHERE len(t) >= 2)
),
tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
bgc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM bgc GROUP BY 1),
vs AS (
  SELECT count(DISTINCT term) AS v
  FROM (SELECT unnest(t) AS term FROM toks)
),
sc AS (
  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
         round(sum(tf.tf * ln((bgc.c + 1) / CAST(ctx.cc + vs.v AS DOUBLE)))
               / sum(tf.tf), 6) AS avg_logprob
  FROM tf JOIN bgc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vs
  GROUP BY tf.doc_id)
SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.avg_logprob
FROM documents d LEFT JOIN sc USING (doc_id)"""

ORACLES["doc_dedup_keep"] = "WITH RECURSIVE " + _jaccard_ctes(0.4) + """,
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
clusters AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
SELECT d.doc_id, d.lang, d.source
FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
WHERE x.doc_id IS NULL"""

ORACLES["doc_tokenizer_fertility"] = r"""
WITH per AS (
  SELECT lang, source,
         len(regexp_extract_all(text,
             '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +'))
           AS n_sub,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
  FROM documents)
SELECT lang, source,
       CAST(sum(n_sub) AS BIGINT) AS subwords,
       CAST(sum(n_tok) AS BIGINT) AS words,
       round(sum(n_sub) / CAST(sum(n_tok) AS DOUBLE), 6) AS fertility
FROM per GROUP BY 1, 2"""


def q_doc_bpe_pairs(spark, sf_dir):
    """BPE tokenizer-training pair statistics (Sennrich et al. 2016
    counting step): corpus word frequencies -> per-distinct-word
    character+</w> symbol sequences -> adjacent-pair counts weighted
    by word frequency. Top 200 pairs, count desc then (a, b) asc — a
    TOTAL order, so the LIMIT selects identical rows in both engines.
    operators.text.bpe_learn_merges iterates this into a merge table
    (pinned against a pure-Python golden in test_text_ops.TestBpe;
    greedy re-segmentation is not faithfully SQL-expressible —
    shared-boundary runs defeat string-replace)."""
    return text.bpe_pair_counts(_docs(spark, sf_dir), top_k=200)


QUERIES["doc_bpe_pairs"] = q_doc_bpe_pairs

ORACLES["doc_bpe_pairs"] = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents
  WHERE length(trim(text)) > 0
),
wc AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
syms AS (
  SELECT c,
         list_append(list_transform(range(1, length(w) + 1),
                                    i -> w[i]), '</w>') AS s
  FROM wc
),
pairs AS (
  SELECT s[i] AS a, s[i + 1] AS b, c
  FROM syms, unnest(range(1, len(s))) AS t(i)
)
SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt
FROM pairs
GROUP BY a, b
ORDER BY cnt DESC, a, b
LIMIT 200"""


def q_doc_winnow_pairs(spark, sf_dir):
    """Winnowing near-dup candidate pairs (Schleimer et al. 2003, the
    MOSS algorithm): positional k-gram Rabin-Karp hashes -> w-window
    minima -> distinct fingerprint set per doc -> ONE fingerprint
    equi-join with a stop-fingerprint df-cap before it. Guarantee:
    a shared run of >= k + w - 1 chars shares >= 1 fingerprint; pairs
    here share >= 2. Portable modular arithmetic, so the oracle
    reproduces the fingerprint sets bit-for-bit."""
    return dedup.winnow_near_dup_pairs(_docs(spark, sf_dir),
                                       k=8, w=4, min_shared=2,
                                       max_df=50)


QUERIES["doc_winnow_pairs"] = q_doc_winnow_pairs

ORACLES["doc_winnow_pairs"] = """
WITH d AS (SELECT doc_id, lower(text) AS lt FROM documents),
h AS (
  SELECT doc_id,
         CASE WHEN length(lt) >= 8 THEN
           list_transform(
             generate_series(1, length(lt) - 7),
             i -> list_reduce(
                    list_transform(generate_series(i, i + 7),
                                   j -> CAST(ascii(substring(lt, j, 1)) AS BIGINT)),
                    (acc, c) -> (acc * 257 + c) % 1000000007))
         ELSE [] END AS hs
  FROM d),
fps AS (
  SELECT DISTINCT doc_id, fp
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(hs) - 4 + 1),
             j -> list_min(hs[j : j + 4 - 1]))) AS fp
    FROM h WHERE len(hs) >= 4)),
kept AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
f2 AS (SELECT doc_id, f.fp FROM fps f JOIN kept USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared
FROM f2 a JOIN f2 b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2"""
