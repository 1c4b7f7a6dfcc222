"""Driver queries for the training-data pipeline operators
(operators/pipeline.py + quantize_embeddings): benchmark-contamination
scan, repetition signals, PII scrubbing, deterministic stratified
sampling, quality gating, dataset-card cube, embedding quantization.

Every query has an exact DuckDB oracle: the operators are restricted to
md5 bucketing, RE2-compatible regexes, and list/array math that both
engines evaluate bit-identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- queries

CONTAM_N = 6


def q_contamination(spark, sf_dir):
    """Docs vs a deterministic 'benchmark' subset (every 50th doc, which
    is itself in-corpus — those score contamination 1.0 by construction,
    a built-in sanity signal)."""
    from filodb_spark.operators.pipeline import contamination_check
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    out = contamination_check(docs, bench, n=CONTAM_N)
    return out.select("doc_id", F.col("n_grams").cast("long").alias("n_grams"),
                      F.col("n_hits").cast("long").alias("n_hits"),
                      "contamination")


def q_repetition(spark, sf_dir):
    from filodb_spark.operators.pipeline import ngram_repetition
    out = ngram_repetition(_docs(spark, sf_dir))
    return out.select("doc_id", "dup2_frac", "dup3_frac")


def q_pii_scrub(spark, sf_dir):
    """The fixture corpus is synthetic word salad with no PII, so the
    query INJECTS deterministic PII-shaped strings for a subset of docs
    (id-derived emails/IPs/SSNs/phones) and scrubs them — both engines
    synthesize and scrub identically, and the untouched docs prove the
    no-false-positive path."""
    from filodb_spark.operators.pipeline import pii_scrub
    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    aug = d.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(i % 7 == 0, F.concat(F.lit(" mail user"), i,
                                        F.lit("@example.com"))).otherwise(""),
            F.when(i % 11 == 0, F.concat(F.lit(" host 10.0."), (i % 200),
                                         F.lit(".25"))).otherwise(""),
            F.when(i % 13 == 0, F.lit(" id 123-45-6789")).otherwise(""),
            F.when(i % 17 == 0, F.concat(F.lit(" call +1 555 000 "),
                                         (1000 + i % 9000))).otherwise("")))
    from filodb_spark.operators.pipeline import PII_PATTERNS
    out = pii_scrub(aug, "text2")
    return out.select(
        "doc_id",
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}")
          for n, _, _ in PII_PATTERNS],
        F.col("n_pii").cast("long").alias("n_pii"),
        F.md5("redacted").alias("redacted_fp"))


SAMPLE_FRACTIONS = {"es": 0.5, "de": 0.3, "zh": 0.2}


def q_strat_sample(spark, sf_dir):
    from filodb_spark.operators.pipeline import stratified_sample
    out = stratified_sample(_docs(spark, sf_dir), "lang", SAMPLE_FRACTIONS,
                            default_fraction=0.1)
    return out.select("doc_id", "lang")


def q_strat_topk(spark, sf_dir):
    from filodb_spark.operators.pipeline import stratified_topk
    out = stratified_topk(_docs(spark, sf_dir), "lang", k=5)
    return out.select("doc_id", "lang")


QF_ARGS = dict(min_tokens=20, min_quality=0.3, max_dup3=0.08)


def q_quality_filter(spark, sf_dir):
    from filodb_spark.operators.pipeline import quality_filter
    out = quality_filter(_docs(spark, sf_dir), **QF_ARGS)
    return out.select("doc_id", "keep", "drop_reason")


def q_dataset_card(spark, sf_dir):
    from filodb_spark.operators.pipeline import dataset_card
    return dataset_card(_docs(spark, sf_dir))


def q_emb_quantize(spark, sf_dir):
    """Driver-facing shape: the operator's ``codes array<int>`` column is
    CSV-stringified here because the driver's canonicalizer hashes scalar
    cells only (round-3 verdict: pandas factorize cannot hash lists).
    The array API itself stays on quantize_embeddings."""
    from filodb_spark.operators.similarity import quantize_embeddings
    out = quantize_embeddings(_emb(spark, sf_dir))
    return out.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")),
                     ",").alias("codes_csv"),
        "vmin", "scale", "max_abs_err")


def q_url_filter(spark, sf_dir):
    """The fixture corpus has no URLs, so the query injects
    deterministic ones (benign + blocklisted, id-derived) and runs the
    domain blocklist filter — both engines synthesize identically and
    the untouched docs prove the no-false-positive path."""
    from filodb_spark.operators.pipeline import url_domain_filter
    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    aug = d.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(i % 5 == 0,
                   F.concat(F.lit(" see https://site"), (i % 7),
                            F.lit(".example.org/page/"), i)).otherwise(""),
            F.when(i % 9 == 0,
                   F.lit(" ref https://spam.example.com/x?q=1")).otherwise(""),
            F.when(i % 14 == 0, F.lit(" via http://ads.invalid")).otherwise("")))
    out = url_domain_filter(aug, "text2")
    # domains is array<string>: CSV-join for the driver canonicalizer
    # (already distinct+sorted, so the join is deterministic)
    return out.select("doc_id", "n_urls", "n_blocked",
                      F.array_join("domains", ",").alias("domains_csv"),
                      "keep")


PACK_BUDGET, PACK_SHARDS = 64, 4


def q_pack_sequences(spark, sf_dir):
    from filodb_spark.operators.pipeline import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET,
                          shards=PACK_SHARDS)


MIX_WEIGHTS = {"src0": 2.0, "src1": 0.5, "src2": 1.25}


def q_mix_sources(spark, sf_dir):
    from filodb_spark.operators.pipeline import mix_sources
    out = mix_sources(_docs(spark, sf_dir), MIX_WEIGHTS)
    return out.select("doc_id", "source",
                      F.col("copy_idx").cast("long").alias("copy_idx"))


def q_source_divergence(spark, sf_dir):
    from filodb_spark.operators.pipeline import source_divergence
    return source_divergence(_docs(spark, sf_dir))


def q_length_quantiles(spark, sf_dir):
    from filodb_spark.operators.pipeline import length_quantiles
    return length_quantiles(_docs(spark, sf_dir))


def q_manifest(spark, sf_dir):
    """Flagship end-to-end pipeline composition: quality gate -> exact
    dedup (min-id canonical per fingerprint) -> deterministic split ->
    embedding attach. The output is the training manifest a downstream
    tokenizer would consume; every stage is an existing operator, so the
    oracle is the same composition in SQL."""
    from pyspark.sql import Window
    from filodb_spark.operators.pipeline import quality_filter
    from filodb_spark.operators.text import assign_split, fingerprint
    d = _docs(spark, sf_dir)
    kept = quality_filter(d, **QF_ARGS).where(F.col("keep"))
    fp = kept.withColumn("fp", fingerprint(F.col("text")))
    w = Window.partitionBy("fp")
    canon = (fp.withColumn("_m", F.min("doc_id").over(w))
             .where(F.col("doc_id") == F.col("_m")))
    sp = assign_split(canon)
    emb = _emb(spark, sf_dir).select(F.col("vec_id"))
    return (sp.join(emb, sp["doc_id"] == emb["vec_id"], "left")
            .select("doc_id", "lang", "source", "split",
                    F.col("vec_id").isNotNull().alias("has_embedding"),
                    F.col("n_chars")))


TOKEN_BUDGET = 20_000


def q_token_budget(spark, sf_dir):
    """Budgeted selection with a banded (never single-partition) global
    prefix sum; the oracle's naive ordered window checks it exactly."""
    from filodb_spark.operators.pipeline import token_budget_select
    return token_budget_select(_docs(spark, sf_dir), TOKEN_BUDGET)


def q_dedup_incremental(spark, sf_dir):
    """Batch-vs-corpus incremental dedup with deterministic membership;
    per-doc status (new / dup_corpus / dup_batch)."""
    from filodb_spark.operators.pipeline import incremental_dedup
    return incremental_dedup(_docs(spark, sf_dir))


def q_dataset_diff(spark, sf_dir):
    """Snapshot diff with deterministic synthetic versions: old = md5
    bucket < 9500, new = bucket >= 500 with every 10th doc edited —
    exercises all four statuses."""
    from filodb_spark.operators.pipeline import dataset_diff
    from filodb_spark.operators.text import split_hash
    d = _docs(spark, sf_dir)
    b = split_hash(F.col("doc_id"))
    old = d.where(b < 9500)
    new = (d.where(b >= 500)
           .withColumn("text",
                       F.when(F.col("doc_id") % 10 == 0,
                              F.concat(F.col("text"), F.lit(" v2")))
                       .otherwise(F.col("text"))))
    return dataset_diff(old, new)


def _aug_multiline(d):
    """The fixture corpus is single-line word salad with no punctuation,
    so the line-level ops get a DETERMINISTIC multi-line augmentation
    (the pl_url_filter/pl_pii_scrub pattern): both engines build the
    same text — internal line breaks with terminal punctuation, plus
    id-derived bullet / javascript / ellipsis / lorem-ipsum / brace /
    short-line injections that exercise every rule."""
    i = F.col("doc_id")
    parts = [
        F.replace(F.col("text"), F.lit(" value "),
                  F.lit(".\nthe value ")),
        F.lit("."),
        F.when(i % 3 == 0,
               F.lit("\n- bullet point of the list.")).otherwise(F.lit("")),
        F.when(i % 5 == 0,
               F.lit("\nplease enable javascript to view this page "
                     "today.")).otherwise(F.lit("")),
        F.when(i % 7 == 0,
               F.lit("\nthis line trails off into the distance..."))
         .otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit(" lorem ipsum")).otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit(" { #config }")).otherwise(F.lit("")),
        F.when(i % 4 == 1, F.lit("\ntiny line.")).otherwise(F.lit("")),
    ]
    return d.select("doc_id", F.concat(*parts).alias("text"))


def q_c4_clean(spark, sf_dir):
    """C4 line-level cleaning over the augmented corpus: per-line
    terminal-punctuation / min-words / javascript rules, page-level
    lorem-ipsum and brace tells; cleaned_text is part of the compared
    output so the REWRITE is oracle-checked, not just the counts."""
    from filodb_spark.operators.pipeline import c4_line_clean
    out = c4_line_clean(_aug_multiline(_docs(spark, sf_dir)),
                        min_words=5, min_kept_lines=2)
    return out.select("doc_id", "n_lines", "n_lines_kept",
                      "cleaned_text", "keep")


def q_gopher_rules(spark, sf_dir):
    """Gopher document-quality rule panel over the augmented corpus:
    every intermediate signal is in the compared output, so the oracle
    pins the arithmetic, not only the final verdicts."""
    from filodb_spark.operators.pipeline import gopher_quality
    out = gopher_quality(_aug_multiline(_docs(spark, sf_dir)),
                         min_words=12)
    return out.select("doc_id", "n_words", "mean_word_len",
                      "symbol_ratio", "frac_bullet_lines",
                      "frac_ellipsis_lines", "frac_alpha_words",
                      "n_stop_hits", "drop_reason", "keep")


def q_c4_span_dedup(spark, sf_dir):
    """C4 repeated-span global dedup over the augmented corpus with
    span=2: the id-derived injected lines repeat across documents
    (every %12==9 doc shares its (bullet, tiny-line) tail, etc.), so
    non-canonical occurrences genuinely lose lines; cleaned_text is
    compared, pinning the rewrite."""
    from filodb_spark.operators.pipeline import c4_span_dedup
    out = c4_span_dedup(_aug_multiline(_docs(spark, sf_dir)), span=2)
    return out.select("doc_id", "n_lines", "n_lines_kept",
                      "cleaned_text")


def q_gopher_repetition(spark, sf_dir):
    """Gopher repetition panel over the multi-line augmentation plus an
    id-derived duplicate-line injection (every %6==0 doc repeats a
    line twice), so the duplicate-line fractions and the top-n-gram
    coverage all carry signal."""
    from filodb_spark.operators.pipeline import gopher_repetition
    aug = _aug_multiline(_docs(spark, sf_dir))
    i = F.col("doc_id")
    aug = aug.select("doc_id", F.concat(
        F.col("text"),
        F.when(i % 6 == 0,
               F.lit("\nrepeat me now.\nrepeat me now."))
         .otherwise(F.lit(""))).alias("text"))
    out = gopher_repetition(aug)
    return out.select("doc_id", "frac_dup_lines",
                      "frac_dup_line_chars", "top2gram_char_frac",
                      "top3gram_char_frac", "top4gram_char_frac",
                      "drop_reason", "keep")


def q_temperature_mix(spark, sf_dir):
    """T5 temperature mixing at alpha=0.5, budget = corpus size: the
    small fixture sources upsample, the big ones downsample; the
    oracle recomputes the integer quotas and md5-order selection."""
    from filodb_spark.operators.pipeline import temperature_mix
    out = temperature_mix(_docs(spark, sf_dir), alpha=0.5)
    return out.select("doc_id", "source",
                      F.col("copy_idx").cast("long").alias("copy_idx"))


def q_web_pipeline(spark, sf_dir):
    """Flagship web-corpus cleaning composition — the full r13 stack
    in one plan, the way a C4/Gopher-style crawl pipeline runs it:
    C4 line cleaning (drop pages failing the line/page tells) ->
    repeated-span global dedup on the CLEANED text -> both Gopher
    rule panels on the deduped text -> temperature mixing (n^0.5)
    of the survivors. Every stage is an existing gated operator, so
    the oracle is the same composition in SQL; the output is the
    final training mixture (doc, source, copy_idx) plus the
    surviving line count, oracle-compared row for row."""
    from filodb_spark.operators.pipeline import (c4_line_clean,
                                                 c4_span_dedup,
                                                 gopher_quality,
                                                 gopher_repetition,
                                                 temperature_mix)
    docs = _docs(spark, sf_dir)
    aug = _aug_multiline(docs)
    c4 = (c4_line_clean(aug, min_words=5, min_kept_lines=2)
          .where(F.col("keep"))
          .select("doc_id", F.col("cleaned_text").alias("text")))
    sd = (c4_span_dedup(c4, span=2)
          .where(F.col("n_lines_kept") > 0)
          .select("doc_id", F.col("cleaned_text").alias("text"),
                  "n_lines_kept"))
    gq = gopher_quality(sd, min_words=12).where(F.col("keep")) \
        .select("doc_id", "text", "n_lines_kept")
    gr = gopher_repetition(gq).where(F.col("keep")) \
        .select("doc_id", "n_lines_kept")
    survivors = (gr.join(docs.select("doc_id", "source"), "doc_id")
                 .localCheckpoint())
    out = temperature_mix(survivors, alpha=0.5)
    return out.select("doc_id", "source",
                      F.col("n_lines_kept").cast("long")
                       .alias("n_lines_kept"),
                      F.col("copy_idx").cast("long").alias("copy_idx"))


def q_ccnet_buckets(spark, sf_dir):
    """CCNet per-language perplexity thirds over the raw fixture (the
    corpus-unigram score is the gated doc_unigram_lp model; thresholds
    are exact per-lang percentiles, so the oracle mirrors quantile_cont
    exactly)."""
    from filodb_spark.operators.pipeline import ccnet_ppl_buckets
    out = ccnet_ppl_buckets(_docs(spark, sf_dir))
    return out.select("doc_id", "lang", "n_tok", "avg_logprob",
                      "ppl_bucket")


QUERIES = {
    "pl_c4_clean": q_c4_clean,
    "pl_c4_span_dedup": q_c4_span_dedup,
    "pl_ccnet_buckets": q_ccnet_buckets,
    "pl_gopher_repetition": q_gopher_repetition,
    "pl_gopher_rules": q_gopher_rules,
    "pl_temperature_mix": q_temperature_mix,
    "pl_web_pipeline": q_web_pipeline,
    "pl_token_budget": q_token_budget,
    "pl_dedup_incremental": q_dedup_incremental,
    "pl_dataset_diff": q_dataset_diff,
    "pl_contamination": q_contamination,
    "pl_manifest": q_manifest,
    "pl_url_filter": q_url_filter,
    "pl_pack_sequences": q_pack_sequences,
    "pl_mix_sources": q_mix_sources,
    "pl_source_divergence": q_source_divergence,
    "pl_length_quantiles": q_length_quantiles,
    "pl_repetition": q_repetition,
    "pl_pii_scrub": q_pii_scrub,
    "pl_strat_sample": q_strat_sample,
    "pl_strat_topk": q_strat_topk,
    "pl_quality_filter": q_quality_filter,
    "pl_dataset_card": q_dataset_card,
    "emb_quantize": q_emb_quantize,
}


# ---------------------------------------------------------------- oracles

# whitespace tokens of lowercased text; [] for blank docs (mirrors
# operators.text.tokens)
_TOK = """
  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(lower(text)), '\\s+')
                 END AS t
  FROM documents
"""


def _grams_sql(n: int, col: str = "t") -> str:
    """Word n-grams over the token list (mirrors word_ngrams)."""
    return (f"list_transform(range(1, len({col}) - {n} + 2), "
            f"i -> array_to_string({col}[i:i+{n - 1}], ' '))")


_MD5_BUCKET = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
               "AS BIGINT) % 10000")

ORACLES = {
    "pl_contamination": f"""
WITH tok AS ({_TOK}),
g AS (SELECT doc_id, {_grams_sql(CONTAM_N)} AS gs FROM tok),
bench AS (SELECT DISTINCT unnest(gs) AS bg FROM g WHERE doc_id % 50 = 0),
dg AS (SELECT doc_id, unnest(list_distinct(gs)) AS g FROM g),
h AS (SELECT dg.doc_id, count(*) AS n_grams, count(bench.bg) AS n_hits
      FROM dg LEFT JOIN bench ON dg.g = bench.bg GROUP BY 1)
SELECT d.doc_id,
       coalesce(h.n_grams, 0) AS n_grams,
       coalesce(h.n_hits, 0) AS n_hits,
       CASE WHEN coalesce(h.n_grams, 0) > 0
            THEN round(h.n_hits / CAST(h.n_grams AS DOUBLE), 6)
            ELSE 0.0 END AS contamination
FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id""",
    "pl_repetition": f"""
WITH tok AS ({_TOK}),
g AS (SELECT doc_id, {_grams_sql(2)} AS g2, {_grams_sql(3)} AS g3 FROM tok)
SELECT doc_id,
       CASE WHEN len(g2) > 0
            THEN round(1.0 - len(list_distinct(g2)) / CAST(len(g2) AS DOUBLE), 6)
            ELSE 0.0 END AS dup2_frac,
       CASE WHEN len(g3) > 0
            THEN round(1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE), 6)
            ELSE 0.0 END AS dup3_frac
FROM g""",
    # replacement order (email, ssn, ipv4, phone) is the operator
    # contract; counts are taken on the progressively-redacted string.
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # always-global behavior.
    "pl_pii_scrub": """
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 7 = 0
            THEN ' mail user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 11 = 0
            THEN ' host 10.0.' || (doc_id % 200) || '.25' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' id 123-45-6789' ELSE '' END
    || CASE WHEN doc_id % 17 = 0
            THEN ' call +1 555 000 ' || (1000 + doc_id % 9000) ELSE '' END
    AS s0
  FROM documents),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(s0,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
              regexp_replace(s0,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g') AS s FROM aug),
s2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(s, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
              regexp_replace(s, '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS s
       FROM s1),
s3 AS (SELECT doc_id, n_email, n_ssn,
              len(regexp_extract_all(s,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
              regexp_replace(s,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                  '<IP>', 'g') AS s FROM s2),
s4 AS (SELECT doc_id, n_email, n_ssn, n_ipv4,
              len(regexp_extract_all(s, '\\+?\\d[\\d -]{7,}\\d')) AS n_phone,
              regexp_replace(s, '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g') AS s
       FROM s3)
SELECT doc_id, n_email, n_ssn, n_ipv4, n_phone,
       n_email + n_ssn + n_ipv4 + n_phone AS n_pii,
       md5(s) AS redacted_fp
FROM s4""",
    "pl_strat_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {_MD5_BUCKET} <
      CASE lang WHEN 'es' THEN 5000 WHEN 'de' THEN 3000 WHEN 'zh' THEN 2000
                ELSE 1000 END""",
    "pl_strat_topk": f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents)
WHERE rk <= 5""",
    # mirrors quality_filter(min_tokens=20, min_quality=0.3, max_dup3=.08)
    # and the quality_score / token_count column expressions exactly
    "pl_quality_filter": f"""
WITH tok AS ({_TOK}),
m AS (
  SELECT d.doc_id, len(tk.t) AS n_tok,
         length(regexp_replace(trim(d.text), '\\s+', '', 'g'))
           / CAST(len(tk.t) AS DOUBLE) AS wl,
         {_grams_sql(3, 'tk.t')} AS g3
  FROM documents d JOIN tok tk ON d.doc_id = tk.doc_id),
q AS (
  SELECT doc_id, n_tok,
         least(1.0, n_tok / 100.0)
           * (CASE WHEN wl >= 3.0 AND wl <= 8.0 THEN 1.0 ELSE 0.5 END)
           AS quality,
         CASE WHEN len(g3) > 0
              THEN 1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)
              ELSE 0.0 END AS dup3
  FROM m)
SELECT doc_id,
       CASE WHEN n_tok < 20 THEN 'too_short'
            WHEN n_tok > 100000 THEN 'too_long'
            WHEN quality < 0.3 THEN 'low_quality'
            WHEN dup3 > 0.08 THEN 'repetitive'
       END AS drop_reason,
       (CASE WHEN n_tok < 20 THEN 'too_short'
             WHEN n_tok > 100000 THEN 'too_long'
             WHEN quality < 0.3 THEN 'low_quality'
             WHEN dup3 > 0.08 THEN 'repetitive'
        END) IS NULL AS keep
FROM q""",
    "pl_dataset_card": """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY CUBE (lang, source)""",
    # end-to-end composition: quality gate -> fingerprint dedup ->
    # split -> embedding attach (each stage mirrors its operator oracle)
    "pl_manifest": f"""
WITH tok AS ({_TOK}),
m AS (
  SELECT d.doc_id, d.lang, d.source, d.n_chars, d.text, len(tk.t) AS n_tok,
         length(regexp_replace(trim(d.text), '\\s+', '', 'g'))
           / CAST(len(tk.t) AS DOUBLE) AS wl,
         {_grams_sql(3, 'tk.t')} AS g3
  FROM documents d JOIN tok tk ON d.doc_id = tk.doc_id),
q AS (
  SELECT *, least(1.0, n_tok / 100.0)
            * (CASE WHEN wl >= 3.0 AND wl <= 8.0 THEN 1.0 ELSE 0.5 END)
            AS quality,
         CASE WHEN len(g3) > 0
              THEN 1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)
              ELSE 0.0 END AS dup3
  FROM m),
kept AS (
  SELECT doc_id, lang, source, n_chars, text FROM q
  WHERE n_tok >= 20 AND n_tok <= 100000 AND quality >= 0.3
    AND dup3 <= 0.08),
fp AS (
  SELECT *, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
  FROM kept),
canon AS (
  SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY f) AS mn FROM fp)
  WHERE doc_id = mn),
sp AS (
  SELECT doc_id, lang, source, n_chars,
         CASE WHEN {_MD5_BUCKET} < 9000 THEN 'train'
              WHEN {_MD5_BUCKET} < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM canon)
SELECT sp.doc_id, sp.lang, sp.source, sp.split,
       e.vec_id IS NOT NULL AS has_embedding, sp.n_chars
FROM sp LEFT JOIN embeddings e ON e.vec_id = sp.doc_id""",
    # exact linear-interpolated percentile == quantile_cont
    "pl_length_quantiles": """
WITH t AS (
  SELECT source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n, 0.5), 6) AS q50,
       round(quantile_cont(n, 0.9), 6) AS q90,
       round(quantile_cont(n, 0.99), 6) AS q99
FROM t GROUP BY source""",
    # weights: src0 -> 2.0 (2 copies), src1 -> 0.5 (md5-gated half),
    # src2 -> 1.25 (1 + gated quarter), default 1.0
    "pl_mix_sources": f"""
WITH b AS (SELECT doc_id, source, {_MD5_BUCKET} AS bk FROM documents),
c AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                     WHEN 'src2' THEN 1 ELSE 1 END
       + CASE WHEN bk < (CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 5000
                              WHEN 'src2' THEN 2500 ELSE 0 END)
              THEN 1 ELSE 0 END AS n_copies
  FROM b)
SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy_idx
FROM c WHERE n_copies >= 1""",
    "pl_source_divergence": """
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0),
st AS (SELECT source, term, count(*) AS sc FROM toks GROUP BY 1, 2),
ct AS (SELECT term, CAST(sum(sc) AS BIGINT) AS cc FROM st GROUP BY 1),
stot AS (SELECT source, CAST(sum(sc) AS BIGINT) AS s_n FROM st GROUP BY 1),
ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS c_n FROM ct)
SELECT st.source, CAST(sum(sc) AS BIGINT) AS n_tokens,
       round(sum((sc / CAST(s_n AS DOUBLE))
                 * ln((sc / CAST(s_n AS DOUBLE))
                      / (cc / CAST(c_n AS DOUBLE)))), 6) AS kl
FROM st JOIN ct USING (term) JOIN stot USING (source) CROSS JOIN ctot
GROUP BY st.source""",
    # the URL pattern is RE2-safe and identical on both sides; DuckDB
    # regexp_extract_all takes the group index like Spark's
    "pl_url_filter": """
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 5 = 0
            THEN ' see https://site' || (doc_id % 7) || '.example.org/page/'
                 || doc_id ELSE '' END
    || CASE WHEN doc_id % 9 = 0
            THEN ' ref https://spam.example.com/x?q=1' ELSE '' END
    || CASE WHEN doc_id % 14 = 0 THEN ' via http://ads.invalid' ELSE '' END
    AS s
  FROM documents),
x AS (
  SELECT doc_id,
         regexp_extract_all(s, 'https?://([A-Za-z0-9.-]+)(/[^\\s]*)?', 1)
           AS doms
  FROM aug)
SELECT doc_id,
       CAST(len(doms) AS BIGINT) AS n_urls,
       CAST(len(list_filter(doms, d -> d IN ('spam.example.com',
            'ads.invalid', 'tracker.test'))) AS BIGINT) AS n_blocked,
       coalesce(array_to_string(list_sort(list_distinct(doms)), ','), '')
         AS domains_csv,
       len(list_filter(doms, d -> d IN ('spam.example.com', 'ads.invalid',
           'tracker.test'))) = 0 AS keep
FROM x""",
    # window sum cast to BIGINT (DuckDB widens to HUGEINT — the round-2
    # hash-artifact lesson); all arithmetic below is integer-exact
    "pl_pack_sequences": f"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
  FROM documents),
base AS (
  SELECT doc_id,
         ({_MD5_BUCKET}) % {PACK_SHARDS} AS shard, n
  FROM tok WHERE n > 0),
sp AS (
  SELECT doc_id, shard, n,
         CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
  FROM base),
pieces AS (
  SELECT shard, doc_id, e - n AS s, e,
         unnest(range(CAST(floor((e - n) / {float(PACK_BUDGET)}) AS BIGINT),
                      CAST(floor((e - 1) / {float(PACK_BUDGET)}) AS BIGINT)
                      + 1)) AS seq_id
  FROM sp)
SELECT shard, seq_id, doc_id,
       greatest(s, seq_id * {PACK_BUDGET}) - s + 1 AS tok_start,
       least(e, (seq_id + 1) * {PACK_BUDGET})
         - greatest(s, seq_id * {PACK_BUDGET}) AS n_tok
FROM pieces""",
    "emb_quantize": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings),
s AS (
  SELECT vec_id, e,
         list_aggregate(e, 'min') AS mn,
         (list_aggregate(e, 'max') - list_aggregate(e, 'min')) / 255.0
           AS scale
  FROM v),
qz AS (
  SELECT vec_id, e, mn, scale,
         CASE WHEN scale > 0
              THEN list_transform(e, x -> CAST(floor((x - mn) / scale + 0.5)
                                               AS INTEGER))
              ELSE list_transform(e, x -> 0) END AS codes
  FROM s)
SELECT vec_id,
       array_to_string(codes, ',') AS codes_csv,
       round(mn, 6) AS vmin,
       round(scale, 6) AS scale,
       round(list_aggregate(
           list_transform(range(1, len(e) + 1),
                          i -> abs(e[i] - (codes[i] * scale + mn))),
           'max'), 6) AS max_abs_err
FROM qz"""
}

ORACLES["pl_token_budget"] = f"""
WITH tok AS ({_TOK}),
m AS (
  SELECT d.doc_id, len(tk.t) AS n_tok,
         length(regexp_replace(trim(d.text), '\\s+', '', 'g'))
           / CAST(len(tk.t) AS DOUBLE) AS wl
  FROM documents d JOIN tok tk ON d.doc_id = tk.doc_id),
q AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS tok,
         round(least(1.0, n_tok / 100.0)
               * (CASE WHEN wl >= 3.0 AND wl <= 8.0 THEN 1.0 ELSE 0.5 END),
               6) AS quality
  FROM m),
r AS (
  SELECT doc_id, tok, quality,
         CAST(sum(tok) OVER (ORDER BY quality DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS running
  FROM q)
SELECT doc_id, tok, quality, running FROM r WHERE running <= {TOKEN_BUDGET}"""

ORACLES["pl_dedup_incremental"] = """
WITH fp AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS b
  FROM documents),
corpus AS (SELECT DISTINCT fp FROM fp WHERE b < 8000),
batch AS (SELECT doc_id, fp FROM fp WHERE b >= 8000),
first AS (SELECT fp, min(doc_id) AS first_id FROM batch GROUP BY fp)
SELECT b1.doc_id, b1.fp,
       CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
            WHEN b1.doc_id = f.first_id THEN 'new'
            ELSE 'dup_batch' END AS status
FROM batch b1
LEFT JOIN corpus c ON b1.fp = c.fp
JOIN first f ON b1.fp = f.fp"""

ORACLES["pl_dataset_diff"] = """
WITH base AS (
  SELECT doc_id, text,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS b
  FROM documents),
old AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM base WHERE b < 9500),
new AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(
           CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END),
           '\\s+', ' ', 'g'))) AS fp
  FROM base WHERE b >= 500)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.fp IS NULL THEN 'added'
            WHEN new.fp IS NULL THEN 'removed'
            WHEN old.fp <> new.fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id"""

# shared augmentation for the line-level ops (the Spark twin is
# _aug_multiline): deterministic multi-line text from the single-line
# fixture, identical on both engines
_AUG_MULTILINE = """
  SELECT doc_id,
         replace(text, ' value ', '.' || chr(10) || 'the value ')
         || '.'
         || CASE WHEN doc_id % 3 = 0
                 THEN chr(10) || '- bullet point of the list.'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10)
                      || 'please enable javascript to view this page today.'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN chr(10)
                      || 'this line trails off into the distance...'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' { #config }' ELSE '' END
         || CASE WHEN doc_id % 4 = 1
                 THEN chr(10) || 'tiny line.' ELSE '' END
           AS s
  FROM documents"""

ORACLES["pl_c4_clean"] = f"""
WITH aug AS ({_AUG_MULTILINE}),
l AS (SELECT doc_id, s, string_split(s, chr(10)) AS lines FROM aug),
k AS (
  SELECT doc_id, s, lines,
         list_filter(lines, x ->
           right(rtrim(x, ' '), 1) IN ('.', '!', '?', '"')
           AND (CASE WHEN length(trim(x, ' ')) = 0 THEN 0
                ELSE len(string_split_regex(trim(x, ' '), '[ \\t]+'))
                END) >= 5
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM l)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_lines_kept,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
       (len(kept) >= 2 AND NOT contains(lower(s), 'lorem ipsum')
        AND NOT contains(s, '{{')) AS keep
FROM k"""

ORACLES["pl_gopher_rules"] = f"""
WITH aug AS ({_AUG_MULTILINE}),
w AS (
  SELECT doc_id, s,
         string_split_regex(trim(s, ' '), '[ \\t\\n]+') AS words,
         string_split(s, chr(10)) AS lines
  FROM aug),
sig AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(words, x -> length(x)))
                    AS DOUBLE) / len(words), 6) AS mean_word_len,
         round(CAST((length(s) - length(replace(s, '#', '')))
                    + (length(s) - length(replace(s, '...', ''))) // 3
                    + (length(s) - length(replace(s, '…', '')))
                    AS DOUBLE) / len(words), 6) AS symbol_ratio,
         round(CAST(len(list_filter(lines, x ->
                 left(ltrim(x, ' '), 1) IN ('-', '*', '•')))
               AS DOUBLE) / len(lines), 6) AS frac_bullet_lines,
         round(CAST(len(list_filter(lines, x ->
                 right(rtrim(x, ' '), 3) = '...'
                 OR right(rtrim(x, ' '), 1) = '…'))
               AS DOUBLE) / len(lines), 6) AS frac_ellipsis_lines,
         round(CAST(len(list_filter(words, x ->
                 regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(words), 6) AS frac_alpha_words,
         CAST(len(list_intersect(
                 list_distinct(list_transform(words, x -> lower(x))),
                 ['the', 'be', 'to', 'of', 'and', 'that', 'have',
                  'with'])) AS BIGINT) AS n_stop_hits
  FROM w)
SELECT doc_id, n_words, mean_word_len, symbol_ratio,
       frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
       n_stop_hits,
       CASE WHEN n_words < 12 THEN 'too_few_words'
            WHEN n_words > 100000 THEN 'too_many_words'
            WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
                 THEN 'word_length'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN frac_bullet_lines > 0.9 THEN 'bullet_lines'
            WHEN frac_ellipsis_lines > 0.3 THEN 'ellipsis_lines'
            WHEN frac_alpha_words < 0.8 THEN 'non_alpha_words'
            WHEN n_stop_hits < 2 THEN 'stopwords'
       END AS drop_reason,
       (CASE WHEN n_words < 12 THEN 'too_few_words'
             WHEN n_words > 100000 THEN 'too_many_words'
             WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
                  THEN 'word_length'
             WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
             WHEN frac_bullet_lines > 0.9 THEN 'bullet_lines'
             WHEN frac_ellipsis_lines > 0.3 THEN 'ellipsis_lines'
             WHEN frac_alpha_words < 0.8 THEN 'non_alpha_words'
             WHEN n_stop_hits < 2 THEN 'stopwords'
        END) IS NULL AS keep
FROM sig"""

ORACLES["pl_c4_span_dedup"] = f"""
WITH aug AS ({_AUG_MULTILINE}),
l AS (SELECT doc_id, string_split(s, chr(10)) AS lines FROM aug),
sp0 AS (
  SELECT doc_id, lines,
         CASE WHEN len(lines) >= 2
              THEN generate_series(1, len(lines) - 1)
              ELSE CAST([] AS BIGINT[]) END AS starts
  FROM l),
sp AS (
  SELECT doc_id, unnest(starts) AS start, lines FROM sp0),
spf AS (
  SELECT doc_id, start,
         md5(array_to_string(lines[start:start + 1], chr(10))) AS fp
  FROM sp),
st AS (
  SELECT doc_id, start,
         count(*) OVER (PARTITION BY fp) AS cnt,
         row_number() OVER (PARTITION BY fp
                            ORDER BY doc_id, start) AS rn
  FROM spf),
rm AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, unnest(generate_series(start, start + 1)) AS pos
    FROM st WHERE cnt > 1 AND rn > 1)),
ln AS (
  SELECT doc_id, unnest(lines) AS line,
         generate_subscripts(lines, 1) AS pos
  FROM l),
kept AS (
  SELECT ln.doc_id, ln.pos, ln.line FROM ln
  ANTI JOIN rm ON ln.doc_id = rm.doc_id AND ln.pos = rm.pos),
reb AS (
  SELECT doc_id, count(*) AS kept_n,
         string_agg(line, chr(10) ORDER BY pos) AS cleaned
  FROM kept GROUP BY doc_id)
SELECT l.doc_id,
       CAST(len(l.lines) AS BIGINT) AS n_lines,
       CAST(coalesce(reb.kept_n, 0) AS BIGINT) AS n_lines_kept,
       coalesce(reb.cleaned, '') AS cleaned_text
FROM l LEFT JOIN reb ON l.doc_id = reb.doc_id"""

ORACLES["pl_ccnet_buckets"] = """
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
  GROUP BY doc_id),
base AS (
  SELECT d.doc_id, d.lang, coalesce(sc.n_tok, 0) AS n_tok,
         sc.avg_logprob
  FROM documents d LEFT JOIN sc USING (doc_id)),
thr AS (
  SELECT lang,
         round(quantile_cont(avg_logprob, 2.0 / 3.0), 6) AS t_hi,
         round(quantile_cont(avg_logprob, 1.0 / 3.0), 6) AS t_lo
  FROM base WHERE avg_logprob IS NOT NULL GROUP BY lang)
SELECT b.doc_id, b.lang, b.n_tok, b.avg_logprob,
       CASE WHEN b.avg_logprob IS NULL THEN NULL
            WHEN b.avg_logprob >= t.t_hi THEN 'head'
            WHEN b.avg_logprob >= t.t_lo THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM base b LEFT JOIN thr t USING (lang)"""

def _top_gram_sql(n: int) -> str:
    """Per-doc modal word n-gram (count desc, gram asc) with its
    non-space char length — mirrors gopher_repetition's window."""
    return f"""
g{n} AS (SELECT doc_id, unnest({_grams_sql(n, 't')}) AS g FROM rtok),
c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY 1, 2),
r{n} AS (SELECT doc_id, c, length(replace(g, ' ', '')) AS gl,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, g) AS rn
         FROM c{n}),
top{n} AS (SELECT doc_id, c AS c{n}, gl AS l{n} FROM r{n} WHERE rn = 1)"""


_REP_FRAC = {n: (f"CASE WHEN nonspace > 0 THEN "
                 f"round(CAST(coalesce(c{n} * l{n}, 0) AS DOUBLE) "
                 f"/ nonspace, 6) ELSE 0.0 END") for n in (2, 3, 4)}

_REP_REASON = f"""CASE WHEN frac_dup_lines > 0.30 THEN 'dup_lines'
     WHEN frac_dup_line_chars > 0.20 THEN 'dup_line_chars'
     WHEN {_REP_FRAC[2]} > 0.20 THEN 'top2gram'
     WHEN {_REP_FRAC[3]} > 0.18 THEN 'top3gram'
     WHEN {_REP_FRAC[4]} > 0.16 THEN 'top4gram'
END"""

ORACLES["pl_gopher_repetition"] = f"""
WITH aug0 AS ({_AUG_MULTILINE}),
aug AS (
  SELECT doc_id,
         s || CASE WHEN doc_id % 6 = 0
                   THEN chr(10) || 'repeat me now.'
                        || chr(10) || 'repeat me now.'
                   ELSE '' END AS s
  FROM aug0),
l AS (SELECT doc_id, s, string_split(s, chr(10)) AS lines FROM aug),
ls AS (
  SELECT doc_id,
         len(lines) AS nl, len(list_distinct(lines)) AS nd,
         coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
           AS tot,
         coalesce(list_sum(list_transform(list_distinct(lines),
                                          x -> length(x))), 0) AS dtot,
         length(regexp_replace(trim(s), '\\s+', '', 'g')) AS nonspace
  FROM l),
rtok AS (
  SELECT doc_id,
         CASE WHEN length(trim(s)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(lower(s)), '\\s+') END AS t
  FROM aug),
{_top_gram_sql(2)},
{_top_gram_sql(3)},
{_top_gram_sql(4)},
sig AS (
  SELECT ls.doc_id,
         round(CAST(nl - nd AS DOUBLE) / nl, 6) AS frac_dup_lines,
         CASE WHEN tot > 0
              THEN round(CAST(tot - dtot AS DOUBLE) / tot, 6)
              ELSE 0.0 END AS frac_dup_line_chars,
         nonspace, c2, l2, c3, l3, c4, l4
  FROM ls LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
  LEFT JOIN top4 USING (doc_id))
SELECT doc_id, frac_dup_lines, frac_dup_line_chars,
       {_REP_FRAC[2]} AS top2gram_char_frac,
       {_REP_FRAC[3]} AS top3gram_char_frac,
       {_REP_FRAC[4]} AS top4gram_char_frac,
       {_REP_REASON} AS drop_reason,
       ({_REP_REASON}) IS NULL AS keep
FROM sig"""

ORACLES["pl_temperature_mix"] = """
WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
z AS (SELECT sum(pow(ns, 0.5)) AS z,
             (SELECT count(*) FROM documents) AS total
      FROM n),
q AS (
  SELECT source, ns,
         CAST(floor(round(total * pow(ns, 0.5) / z, 6) + 0.5)
              AS BIGINT) AS quota
  FROM n CROSS JOIN z),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rk
  FROM documents),
c AS (
  SELECT r.doc_id, r.source,
         (quota // ns)
         + CASE WHEN rk <= quota % ns THEN 1 ELSE 0 END AS n_copies
  FROM r JOIN q USING (source))
SELECT doc_id, source,
       CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
FROM c WHERE n_copies >= 1"""

# the flagship composition: each block below is the corresponding
# single-op oracle with its source CTE re-pointed at the previous
# stage's output (C4 clean -> span dedup -> gopher quality ->
# gopher repetition -> temperature mix)
ORACLES["pl_web_pipeline"] = f"""
WITH aug AS ({_AUG_MULTILINE}),
c4l AS (SELECT doc_id, s, string_split(s, chr(10)) AS lines FROM aug),
c4k AS (
  SELECT doc_id, s,
         list_filter(lines, x ->
           right(rtrim(x, ' '), 1) IN ('.', '!', '?', '"')
           AND (CASE WHEN length(trim(x, ' ')) = 0 THEN 0
                ELSE len(string_split_regex(trim(x, ' '), '[ \\t]+'))
                END) >= 5
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM c4l),
c4 AS (
  SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS text
  FROM c4k
  WHERE len(kept) >= 2 AND NOT contains(lower(s), 'lorem ipsum')
        AND NOT contains(s, '{{')),
sdl AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM c4),
sdsp0 AS (
  SELECT doc_id, lines,
         CASE WHEN len(lines) >= 2
              THEN generate_series(1, len(lines) - 1)
              ELSE CAST([] AS BIGINT[]) END AS starts
  FROM sdl),
sdsp AS (SELECT doc_id, unnest(starts) AS start, lines FROM sdsp0),
sdspf AS (
  SELECT doc_id, start,
         md5(array_to_string(lines[start:start + 1], chr(10))) AS fp
  FROM sdsp),
sdst AS (
  SELECT doc_id, start,
         count(*) OVER (PARTITION BY fp) AS cnt,
         row_number() OVER (PARTITION BY fp
                            ORDER BY doc_id, start) AS rn
  FROM sdspf),
sdrm AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id, unnest(generate_series(start, start + 1)) AS pos
    FROM sdst WHERE cnt > 1 AND rn > 1)),
sdln AS (
  SELECT doc_id, unnest(lines) AS line,
         generate_subscripts(lines, 1) AS pos
  FROM sdl),
sdkept AS (
  SELECT sdln.doc_id, sdln.pos, sdln.line FROM sdln
  ANTI JOIN sdrm ON sdln.doc_id = sdrm.doc_id
                AND sdln.pos = sdrm.pos),
sd AS (
  SELECT doc_id, count(*) AS n_lines_kept,
         string_agg(line, chr(10) ORDER BY pos) AS text
  FROM sdkept GROUP BY doc_id),
gqw AS (
  SELECT doc_id, text AS s, n_lines_kept,
         string_split_regex(trim(text, ' '), '[ \\t\\n]+') AS words,
         string_split(text, chr(10)) AS lines
  FROM sd),
gqsig AS (
  SELECT doc_id, s, n_lines_kept,
         CAST(len(words) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(words, x -> length(x)))
                    AS DOUBLE) / len(words), 6) AS mean_word_len,
         round(CAST((length(s) - length(replace(s, '#', '')))
                    + (length(s) - length(replace(s, '...', ''))) // 3
                    + (length(s) - length(replace(s, '…', '')))
                    AS DOUBLE) / len(words), 6) AS symbol_ratio,
         round(CAST(len(list_filter(lines, x ->
                 left(ltrim(x, ' '), 1) IN ('-', '*', '•')))
               AS DOUBLE) / len(lines), 6) AS frac_bullet_lines,
         round(CAST(len(list_filter(lines, x ->
                 right(rtrim(x, ' '), 3) = '...'
                 OR right(rtrim(x, ' '), 1) = '…'))
               AS DOUBLE) / len(lines), 6) AS frac_ellipsis_lines,
         round(CAST(len(list_filter(words, x ->
                 regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / len(words), 6) AS frac_alpha_words,
         CAST(len(list_intersect(
                 list_distinct(list_transform(words, x -> lower(x))),
                 ['the', 'be', 'to', 'of', 'and', 'that', 'have',
                  'with'])) AS BIGINT) AS n_stop_hits
  FROM gqw),
gq AS (
  SELECT doc_id, s AS text, n_lines_kept FROM gqsig
  WHERE NOT (n_words < 12 OR n_words > 100000
             OR mean_word_len < 3.0 OR mean_word_len > 10.0
             OR symbol_ratio > 0.1 OR frac_bullet_lines > 0.9
             OR frac_ellipsis_lines > 0.3 OR frac_alpha_words < 0.8
             OR n_stop_hits < 2)),
grl AS (SELECT doc_id, text AS s, n_lines_kept,
               string_split(text, chr(10)) AS lines FROM gq),
grls AS (
  SELECT doc_id, n_lines_kept,
         len(lines) AS nl, len(list_distinct(lines)) AS nd,
         coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
           AS tot,
         coalesce(list_sum(list_transform(list_distinct(lines),
                                          x -> length(x))), 0) AS dtot,
         length(regexp_replace(trim(s), '\\s+', '', 'g')) AS nonspace
  FROM grl),
rtok2 AS (
  SELECT doc_id,
         CASE WHEN length(trim(s)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(lower(s)), '\\s+') END AS t
  FROM grl),
grg2 AS (SELECT doc_id, unnest({_grams_sql(2, 't')}) AS g FROM rtok2),
grc2 AS (SELECT doc_id, g, count(*) AS c FROM grg2 GROUP BY 1, 2),
grr2 AS (SELECT doc_id, c, length(replace(g, ' ', '')) AS gl,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, g) AS rn
         FROM grc2),
grtop2 AS (SELECT doc_id, c AS c2, gl AS l2 FROM grr2 WHERE rn = 1),
grg3 AS (SELECT doc_id, unnest({_grams_sql(3, 't')}) AS g FROM rtok2),
grc3 AS (SELECT doc_id, g, count(*) AS c FROM grg3 GROUP BY 1, 2),
grr3 AS (SELECT doc_id, c, length(replace(g, ' ', '')) AS gl,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, g) AS rn
         FROM grc3),
grtop3 AS (SELECT doc_id, c AS c3, gl AS l3 FROM grr3 WHERE rn = 1),
grg4 AS (SELECT doc_id, unnest({_grams_sql(4, 't')}) AS g FROM rtok2),
grc4 AS (SELECT doc_id, g, count(*) AS c FROM grg4 GROUP BY 1, 2),
grr4 AS (SELECT doc_id, c, length(replace(g, ' ', '')) AS gl,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY c DESC, g) AS rn
         FROM grc4),
grtop4 AS (SELECT doc_id, c AS c4v, gl AS l4 FROM grr4 WHERE rn = 1),
gr AS (
  SELECT g.doc_id, g.n_lines_kept FROM grls g
  LEFT JOIN grtop2 USING (doc_id) LEFT JOIN grtop3 USING (doc_id)
  LEFT JOIN grtop4 USING (doc_id)
  WHERE NOT (
    round(CAST(nl - nd AS DOUBLE) / nl, 6) > 0.30
    OR (CASE WHEN tot > 0
             THEN round(CAST(tot - dtot AS DOUBLE) / tot, 6)
             ELSE 0.0 END) > 0.20
    OR (CASE WHEN nonspace > 0 THEN
          round(CAST(coalesce(c2 * l2, 0) AS DOUBLE) / nonspace, 6)
        ELSE 0.0 END) > 0.20
    OR (CASE WHEN nonspace > 0 THEN
          round(CAST(coalesce(c3 * l3, 0) AS DOUBLE) / nonspace, 6)
        ELSE 0.0 END) > 0.18
    OR (CASE WHEN nonspace > 0 THEN
          round(CAST(coalesce(c4v * l4, 0) AS DOUBLE) / nonspace, 6)
        ELSE 0.0 END) > 0.16)),
surv AS (
  SELECT gr.doc_id, d.source, gr.n_lines_kept
  FROM gr JOIN documents d USING (doc_id)),
tn AS (SELECT source, count(*) AS ns FROM surv GROUP BY 1),
tz AS (SELECT sum(pow(ns, 0.5)) AS z,
              (SELECT count(*) FROM surv) AS total
       FROM tn),
tq AS (
  SELECT source, ns,
         CAST(floor(round(total * pow(ns, 0.5) / z, 6) + 0.5)
              AS BIGINT) AS quota
  FROM tn CROSS JOIN tz),
tr AS (
  SELECT doc_id, source, n_lines_kept,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rk
  FROM surv),
tc AS (
  SELECT tr.doc_id, tr.source, tr.n_lines_kept,
         (quota // ns)
         + CASE WHEN rk <= quota % ns THEN 1 ELSE 0 END AS n_copies
  FROM tr JOIN tq USING (source))
SELECT doc_id, source, CAST(n_lines_kept AS BIGINT) AS n_lines_kept,
       CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
FROM tc WHERE n_copies >= 1"""
