"""Training-data pipeline operators: contamination checks, repetition
filters, PII scrubbing, stratified sampling, quality gating, dataset
cards.

These are the corpus-hygiene stages a large-scale LLM data pipeline runs
between raw ingest and tokenization. All hot paths are pure column
expressions (JVM-side, codegen) or single hash-aggregations; nothing
here drops to Python. Every computation is restricted to constructs
expressible identically in ANSI SQL (md5 bucketing, RE2-safe regexes,
list/array higher-order functions) so the driver's DuckDB oracles check
them bit-for-bit.

No counterpart in the reference (a metrics/time-series engine); these
extend the engine the way SURVEY.md §2.12 extends the UDF surface.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filodb_spark.operators.text import SPLIT_BUCKETS, split_hash, tokens

__all__ = [
    "word_ngrams", "ngram_repetition", "contamination_check",
    "pii_scrub", "stratified_sample", "stratified_topk",
    "quality_filter", "dataset_card", "url_domain_filter",
    "pack_sequences", "mix_sources", "source_divergence",
    "split_leakage", "length_quantiles", "token_budget_select",
    "incremental_dedup", "dataset_diff", "shuffle_shards",
    "write_training_shards", "read_training_shard",
]


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams (space-joined) over lowercased whitespace tokens.
    Shorter-than-n docs yield an empty array. Pure array math — the SQL
    mirror is list_transform over the same slice windows."""
    toks = tokens(F.lower(text))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def ngram_repetition(df: DataFrame, text_col: str = "text",
                     ns: Sequence[int] = (2, 3)) -> DataFrame:
    """Gopher-style repetition signals: for each n, the fraction of the
    doc's word n-grams that are repeats of an earlier occurrence
    (1 - distinct/total). Boilerplate and looped generations score high.
    Map-only — per-row array folds, no shuffle, no Python; at 100 TB this
    is an embarrassingly parallel scan stage."""
    out = df
    for n in ns:
        g = word_ngrams(F.col(text_col), n)
        frac = F.when(F.size(g) > 0,
                      F.round(1.0 - F.size(F.array_distinct(g))
                              .cast("double") / F.size(g), 6)) \
                .otherwise(F.lit(0.0))
        out = out.withColumn(f"dup{n}_frac", frac)
    return out


def contamination_check(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str | None = None,
                        broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark-contamination scan: fraction of each training doc's
    distinct word n-grams that appear anywhere in an evaluation set —
    the standard n-gram-overlap decontamination test run before
    training (WebText/GPT-2 used n=8).

    Shape: one explode + distinct per side, an equi-join on the gram
    string, one hash-agg per doc. The benchmark gram set is usually
    tiny relative to the corpus — broadcast by default; pass
    broadcast_benchmark=False for giant eval suites and the join
    shuffles on the well-distributed gram key instead.

    Output: (id, n_grams, n_hits, contamination) — distinct-gram counts,
    ratio rounded to 6 dp, 0.0 for docs shorter than n tokens.
    """
    bcol = bench_text_col or text_col
    bench = (benchmark
             .select(F.explode(word_ngrams(F.col(bcol), n)).alias("g"))
             .distinct())
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n)))
        .alias("g"))
    hits = (doc_grams.join(bench.withColumn("_hit", F.lit(1)), "g", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count("_hit").alias("n_hits")))
    base = docs.select(F.col(id_col))
    return (base.join(hits, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                F.when(F.coalesce("n_grams", F.lit(0)) > 0,
                       F.round(F.col("n_hits").cast("double")
                               / F.col("n_grams"), 6))
                .otherwise(F.lit(0.0)).alias("contamination")))


# PII patterns restricted to constructs Java regex and RE2 (DuckDB)
# interpret identically: no backrefs, no lookaround. Replacement order
# matters (email before phone so the digits in a redacted token can't
# re-match) and is part of the operator contract.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str = "text",
              out_col: str = "redacted") -> DataFrame:
    """Detect-and-redact PII-shaped substrings (emails, SSN-shaped ids,
    IPv4s, long digit runs) with per-type match counts. Map-only regexp
    work in codegen; counts are taken on the progressively-redacted text
    in the same fixed order as the replacements, so each character is
    attributed to exactly one type."""
    out = df
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    total = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn(out_col, cur).withColumn("n_pii", total)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping[str, float],
                      id_col: str = "doc_id",
                      default_fraction: float = 0.0) -> DataFrame:
    """Deterministic per-stratum subsample: a row survives iff its
    md5-bucket (same hash as train/val/test splitting) falls under the
    stratum's fraction. Map-only — no shuffle, no sampling RNG, stable
    across engines/runs/repartitions, and composable with assign_split
    (independent md5 inputs would be needed for independence; here the
    sample NESTS across fraction changes, which is what you want for
    scaling-law subset ladders: the 10% set is a subset of the 20%)."""
    bucket = split_hash(F.col(id_col))
    thresh = None
    for name, frac in fractions.items():
        cut = int(round(frac * SPLIT_BUCKETS))
        cond = F.col(strata_col) == name
        thresh = F.when(cond, cut) if thresh is None else \
            thresh.when(cond, cut)
    thresh = thresh.otherwise(int(round(default_fraction * SPLIT_BUCKETS)))
    return df.where(bucket < thresh)


def stratified_topk(df: DataFrame, strata_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Exactly k rows per stratum, chosen deterministically by md5 rank —
    the distributed stand-in for per-stratum reservoir sampling (same
    guarantee: k uniform-ish rows per group, stable across runs). One
    shuffle on the stratum key; rank is a bounded window. For heavily
    skewed strata sizes the per-partition sort is the cost — k is small,
    so Spark's TopK (rank <= k) window stays memory-bounded."""
    from pyspark.sql import Window
    w = (Window.partitionBy(strata_col)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k).drop("_rk"))


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_tokens: int = 10, max_tokens: int = 100_000,
                   min_quality: float = 0.25,
                   max_dup3: float = 0.25,
                   langs: Sequence[str] | None = None,
                   lang_col: str = "lang") -> DataFrame:
    """Compose the text-quality signals into a keep/drop decision with
    the FIRST failing rule as the drop reason (rule order is the
    contract, mirroring how production filter stacks report attrition).
    Map-only; the output feeds the dataset card's attrition table."""
    from filodb_spark.operators.text import quality_score, token_count
    t = F.col(text_col)
    g3 = word_ngrams(t, 3)
    dup3 = F.when(F.size(g3) > 0,
                  1.0 - F.size(F.array_distinct(g3)).cast("double")
                  / F.size(g3)).otherwise(F.lit(0.0))
    checks = [
        ("too_short", token_count(t) < min_tokens),
        ("too_long", token_count(t) > max_tokens),
        ("low_quality", quality_score(t) < min_quality),
        ("repetitive", dup3 > max_dup3),
    ]
    if langs is not None:
        checks.append(("lang", ~F.col(lang_col).isin(*langs)))
    reason = None
    for name, cond in checks:
        reason = F.when(cond, F.lit(name)) if reason is None else \
            reason.when(cond, F.lit(name))
    reason = reason.otherwise(F.lit(None).cast("string"))
    return (df.withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason").isNull()))


C4_TERMINAL_PUNCT: tuple[str, ...] = (".", "!", "?", '"')


def c4_line_clean(df: DataFrame, text_col: str = "text",
                  min_words: int = 5,
                  min_kept_lines: int = 3) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the
    filter stack behind the C4 corpus): a LINE survives when it ends
    in a terminal punctuation mark (. ! ? \"), carries at least
    `min_words` words, and does not mention 'javascript'
    (case-insensitive); the PAGE survives when at least
    `min_kept_lines` lines survive and the page contains neither
    'lorem ipsum' (case-insensitive) nor a '{' (the paper's
    boilerplate/code tells). Unlike quality_filter's document-level
    score, this REWRITES the document: cleaned_text is the kept lines
    re-joined.

    Exact and SQL-expressible (line split + list_filter mirror in
    DuckDB — the pl_c4_clean oracle), so it is oracle-gated like every
    other pipeline op. Map-only string/array expressions in codegen:
    at 100 TB this is an embarrassingly parallel scan with no shuffle,
    no Python, and column-pruned input (only the text column is read).

    Output adds: n_lines, n_lines_kept, cleaned_text, keep."""
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _wc(x):
        tx = F.trim(x)
        return F.when(F.length(tx) == 0, F.lit(0)) \
                .otherwise(F.size(F.split(tx, r"[ \t]+")))

    def _keep_line(x):
        return (F.substring(F.rtrim(x), -1, 1).isin(*C4_TERMINAL_PUNCT)
                & (_wc(x) >= min_words)
                & ~F.lower(x).contains("javascript"))

    kept = F.filter(lines, _keep_line)
    return (df.withColumn("n_lines", F.size(lines).cast("long"))
            .withColumn("n_lines_kept", F.size(kept).cast("long"))
            .withColumn("cleaned_text", F.array_join(kept, "\n"))
            .withColumn("keep",
                        (F.size(kept) >= min_kept_lines)
                        & ~F.lower(t).contains("lorem ipsum")
                        & ~t.contains("{")))


def gopher_repetition(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_dup_line_frac: float = 0.30,
                      max_dup_line_char_frac: float = 0.20,
                      top_ngram_limits: tuple = ((2, 0.20), (3, 0.18),
                                                 (4, 0.16))) -> DataFrame:
    """Gopher repetition-removal rules (Rae et al. 2021 A1.1 — the
    companion panel to gopher_quality's quality heuristics): fraction
    of duplicate lines, fraction of characters inside duplicate line
    occurrences, and the fraction of (non-whitespace) characters
    covered by the single most frequent word n-gram for each n in
    `top_ngram_limits` (paper defaults: 2-gram 0.20, 3-gram 0.18,
    4-gram 0.16). First failing rule is the drop reason; all signals
    are emitted for re-thresholding.

    Deterministic definitions (both engines compute them identically —
    the pl_gopher_repetition oracle): duplicate-line fractions come
    from the line multiset vs its distinct set (order-free); the top
    n-gram per doc breaks count ties lexicographically; n-gram char
    coverage = count x non-space chars of the gram, over the doc's
    non-space chars.

    Scale shape: line fractions are pure array expressions (map-only);
    each n-gram panel is one (doc, gram) hash aggregation — partial
    combine map-side, keys are doc-local so no skewed key exists —
    plus a per-doc top-1 window on the aggregated (much smaller)
    frame, then an equi-join back on the id. At 100 TB that is
    len(top_ngram_limits) well-distributed aggregations over the
    corpus, no all-pairs, no driver state.

    Output adds: frac_dup_lines, frac_dup_line_chars,
    top{n}gram_char_frac per n, drop_reason, keep."""
    from pyspark.sql import Window
    t = F.col(text_col)
    lines = F.split(t, "\n")
    nl = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    tot = F.aggregate(lines, F.lit(0).cast("long"),
                      lambda a, x: a + F.length(x))
    dtot = F.aggregate(F.array_distinct(lines), F.lit(0).cast("long"),
                       lambda a, x: a + F.length(x))
    nonspace = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))
    out = (df.withColumn("frac_dup_lines",
                         F.round((nl - nd).cast("double") / nl, 6))
           .withColumn("frac_dup_line_chars",
                       F.when(tot > 0,
                              F.round((tot - dtot).cast("double")
                                      / tot, 6)).otherwise(F.lit(0.0)))
           .withColumn("_nonspace", nonspace))
    ns = [n for n, _ in top_ngram_limits]
    # all n-gram panels in ONE pass (r13): tag each gram with its n,
    # count per (doc, n, gram), take the per-(doc, n) top-1 with the
    # same (count desc, gram asc) tie-break, and pivot the <=len(ns)
    # rows per doc back to columns — one corpus scan, one aggregation,
    # one window and one join instead of one of each PER n (plan went
    # ~9 Exchanges -> ~4; a doc with no n-grams for some n simply has
    # no tagged entries, so the pivot leaves that column null exactly
    # like the old per-n left join did)
    def _tag(n):
        # factory, not a default-arg lambda: a 2-arg lambda makes
        # F.transform pass the ELEMENT INDEX as the second argument
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))
    tagged = F.flatten(F.array(*[
        F.transform(word_ngrams(t, n), _tag(n)) for n in ns]))
    g = (df.select(F.col(id_col), F.explode(tagged).alias("_x"))
           .select(id_col, F.col("_x.n").alias("_n"),
                   F.col("_x.g").alias("g")))
    cnt = g.groupBy(id_col, "_n", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col, "_n").orderBy(F.desc("c"), F.asc("g"))
    top1 = (cnt.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .withColumn("_l", F.length(F.replace(F.col("g"), F.lit(" "),
                                                 F.lit("")))))
    piv = top1.groupBy(id_col).agg(
        *[F.max(F.when(F.col("_n") == n, F.col("c"))).alias(f"_c{n}")
          for n in ns],
        *[F.max(F.when(F.col("_n") == n, F.col("_l"))).alias(f"_l{n}")
          for n in ns])
    out = out.join(piv, id_col, "left")
    for n in ns:
        out = out.withColumn(
            f"top{n}gram_char_frac",
            F.when(F.col("_nonspace") > 0,
                   F.round(F.coalesce(F.col(f"_c{n}") * F.col(f"_l{n}"),
                                      F.lit(0)).cast("double")
                           / F.col("_nonspace"), 6))
            .otherwise(F.lit(0.0)))
    out = out.drop("_nonspace",
                   *[f"_c{n}" for n in ns], *[f"_l{n}" for n in ns])
    checks = [
        ("dup_lines", F.col("frac_dup_lines") > max_dup_line_frac),
        ("dup_line_chars",
         F.col("frac_dup_line_chars") > max_dup_line_char_frac),
    ] + [(f"top{n}gram", F.col(f"top{n}gram_char_frac") > lim)
         for n, lim in top_ngram_limits]
    reason = None
    for name, cond in checks:
        reason = F.when(cond, F.lit(name)) if reason is None else \
            reason.when(cond, F.lit(name))
    reason = reason.otherwise(F.lit(None).cast("string"))
    return (out.withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason").isNull()))


def ccnet_ppl_buckets(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", lang_col: str = "lang",
                      cuts: tuple = (1 / 3, 2 / 3)) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020 §4.3: documents
    are split per language into head/middle/tail thirds by LM
    perplexity, and training mixes sample by bucket). The LM here is
    the corpus-unigram model (text.unigram_logprob — the same
    KenLM stand-in the doc_unigram_lp query gates): higher mean
    log-prob = lower perplexity = 'head'. Buckets come from per-LANG
    exact percentiles of the score at `cuts` (CCNet's thirds by
    default): head >= p(cuts[1]), middle >= p(cuts[0]), else tail;
    empty docs (NULL score) get a NULL bucket.

    Scale shape: scoring is unigram_logprob's two hash aggregations +
    a vocab equi-join; the threshold frame is ONE ROW PER LANGUAGE
    and broadcasts back. Exact percentile (matching SQL quantile_cont,
    the length_quantiles discipline) costs a per-lang sort of one
    double per doc — swap in approx_percentile at production scale if
    that sort dominates; the bucket semantics are unchanged, the
    oracle-exactness is the trade.

    Output adds: n_tok, avg_logprob, ppl_bucket."""
    from filodb_spark.operators.text import unigram_logprob
    scored = unigram_logprob(df, id_col, text_col)
    # materialize once (the winnow/bpe localCheckpoint pattern): the
    # threshold branch and the output branch both consume the scored
    # frame, and their subtrees differ (the where-notNull filter), so
    # Spark's exchange reuse does NOT kick in — without this the
    # whole corpus-scoring pipeline runs twice (plan-audited: 10
    # FileScans, 0 ReusedExchange). The checkpointed frame is 3
    # narrow columns per doc.
    base = df.select(F.col(id_col), F.col(lang_col)) \
             .join(scored, id_col).localCheckpoint()
    lo_q, hi_q = cuts
    lp = F.col("avg_logprob")
    thr = (base.where(lp.isNotNull())
           .groupBy(lang_col)
           .agg(F.round(F.percentile(lp, F.lit(hi_q)), 6).alias("_t_hi"),
                F.round(F.percentile(lp, F.lit(lo_q)), 6).alias("_t_lo")))
    return (base.join(F.broadcast(thr), lang_col, "left")
            .withColumn("ppl_bucket",
                        F.when(lp.isNull(),
                               F.lit(None).cast("string"))
                        .when(lp >= F.col("_t_hi"), F.lit("head"))
                        .when(lp >= F.col("_t_lo"), F.lit("middle"))
                        .otherwise(F.lit("tail")))
            .drop("_t_hi", "_t_lo"))


def c4_span_dedup(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", span: int = 3) -> DataFrame:
    """C4 repeated-span deduplication (Raffel et al. 2020 §2.2: 'we
    discarded all but one of any three-sentence span occurring more
    than once in the data set'): every window of `span` consecutive
    LINES is fingerprinted corpus-wide; a span occurring in more than
    one place keeps only its canonical occurrence (lowest
    (doc_id, start)) and every other occurrence has its lines removed;
    the document is rewritten from the surviving lines. Sentences are
    lines here — the same line discipline as c4_line_clean, so the two
    compose (clean, then span-dedup the cleaned text).

    Scale shape (the 100 TB story): span fingerprints go through ONE
    partial-aggregatable groupBy (min + count combine map-side — NOT a
    window over the fingerprint, which could not partial-aggregate the
    boilerplate key holding millions of rows), one equi-join back on
    the fingerprint (AQE handles residual skew), one anti-join on
    (doc, position), and one per-document rebuild groupBy. Never
    all-pairs; duplicate-group size only affects the removal list,
    which is linear in occurrences. Exact and deterministic, so the
    SQL oracle (pl_c4_span_dedup) mirrors it row for row.

    Output: (id, n_lines, n_lines_kept, cleaned_text)."""
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    lines = F.split(F.col("_t"), "\n")
    span_t = "array<struct<start:int,fp:string>>"
    spans = F.when(
        F.size(lines) >= span,
        F.transform(
            F.sequence(F.lit(1), F.size(lines) - span + 1),
            lambda j: F.struct(
                j.cast("int").alias("start"),
                F.md5(F.concat_ws("\n", F.slice(lines, j, span)))
                 .alias("fp")))).otherwise(F.expr(f"cast(array() as {span_t})"))
    sp = (base.select(id_col, F.explode(spans).alias("s"))
          .select(id_col, F.col("s.start").alias("start"),
                  F.col("s.fp").alias("fp")))
    stats = sp.groupBy("fp").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("canon"),
        F.count(F.lit(1)).alias("cnt"))
    rm = (sp.join(stats, "fp")
          .where((F.col("cnt") > 1)
                 & ((F.col(id_col) != F.col(f"canon.{id_col}"))
                    | (F.col("start") != F.col("canon.start"))))
          .select(id_col,
                  F.explode(F.sequence(F.col("start"),
                                       F.col("start") + span - 1))
                  .alias("pos"))
          .distinct())
    ln = (base.select(id_col, F.posexplode(F.split(F.col("_t"), "\n"))
                      .alias("pos0", "line"))
          .select(id_col, (F.col("pos0") + 1).alias("pos"), "line"))
    kept = ln.join(rm, [id_col, "pos"], "left_anti")
    reb = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct("pos", "line"))), lambda x: x["line"]),
            "\n").alias("cleaned_text"),
        F.count(F.lit(1)).alias("_kept"))
    return (base.select(id_col, F.size(F.split(F.col("_t"), "\n"))
                        .cast("long").alias("n_lines"))
            .join(reb, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("_kept", F.lit(0)).cast("long")
                     .alias("n_lines_kept"),
                    F.coalesce("cleaned_text", F.lit(""))
                     .alias("cleaned_text")))


GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and",
                                     "that", "have", "with")


def gopher_quality(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   max_bullet_frac: float = 0.9,
                   max_ellipsis_frac: float = 0.3,
                   min_alpha_frac: float = 0.8,
                   min_stop_hits: int = 2) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, appendix A1.1 — the
    document-level heuristics behind MassiveWeb): word-count bounds,
    mean-word-length bounds, symbol-to-word ratio ('#' chars plus
    '...'/'…' ellipses), bullet-line and ellipsis-line fractions,
    fraction of words containing an alphabetic character, and a
    minimum count of distinct common stop words. The FIRST failing
    rule is the drop reason (rule order is the contract, as in
    quality_filter); every intermediate signal is emitted so the
    rules re-threshold downstream without a recompute.

    All signals are exact string/array arithmetic shared with the
    DuckDB oracle (pl_gopher_rules); ratios round to 6 places on both
    sides. Map-only, no shuffle, no Python — a 100 TB corpus pays one
    column-pruned scan.

    Output adds: n_words, mean_word_len, symbol_ratio,
    frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
    n_stop_hits, drop_reason, keep."""
    t = F.col(text_col)
    tx = F.trim(t)
    words = F.when(F.length(tx) == 0,
                   F.array().cast("array<string>")) \
             .otherwise(F.split(tx, r"[ \t\n]+"))
    n_words = F.size(words)
    nw = n_words.cast("double")
    sum_len = F.aggregate(words, F.lit(0).cast("long"),
                          lambda acc, x: acc + F.length(x))
    mean_wl = F.when(n_words > 0,
                     F.round(sum_len.cast("double") / nw, 6))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = ((F.length(t)
               - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3) \
        .cast("long")
    n_uell = F.length(t) - F.length(F.replace(t, F.lit("…"),
                                              F.lit("")))
    symbol_ratio = F.when(
        n_words > 0, F.round((n_hash + n_dots + n_uell).cast("double")
                             / nw, 6))
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    bullets = F.filter(lines, lambda x: F.substring(
        F.ltrim(x), 1, 1).isin("-", "*", "•"))
    ell_end = F.filter(lines, lambda x: (
        F.substring(F.rtrim(x), -3, 3) == "...")
        | (F.substring(F.rtrim(x), -1, 1) == "…"))
    frac_bullet = F.round(F.size(bullets).cast("double") / n_lines, 6)
    frac_ell = F.round(F.size(ell_end).cast("double") / n_lines, 6)
    alpha = F.filter(words, lambda x: x.rlike("[A-Za-z]"))
    frac_alpha = F.when(n_words > 0,
                        F.round(F.size(alpha).cast("double") / nw, 6))
    stops = F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    n_stop = F.size(stops)
    out = (df.withColumn("n_words", n_words.cast("long"))
           .withColumn("mean_word_len", mean_wl)
           .withColumn("symbol_ratio", symbol_ratio)
           .withColumn("frac_bullet_lines", frac_bullet)
           .withColumn("frac_ellipsis_lines", frac_ell)
           .withColumn("frac_alpha_words", frac_alpha)
           .withColumn("n_stop_hits", n_stop.cast("long")))
    c = F.col
    checks = [
        ("too_few_words", c("n_words") < min_words),
        ("too_many_words", c("n_words") > max_words),
        ("word_length", (c("mean_word_len") < min_mean_word_len)
         | (c("mean_word_len") > max_mean_word_len)),
        ("symbol_ratio", c("symbol_ratio") > max_symbol_ratio),
        ("bullet_lines", c("frac_bullet_lines") > max_bullet_frac),
        ("ellipsis_lines", c("frac_ellipsis_lines") > max_ellipsis_frac),
        ("non_alpha_words", c("frac_alpha_words") < min_alpha_frac),
        ("stopwords", c("n_stop_hits") < min_stop_hits),
    ]
    reason = None
    for name, cond in checks:
        reason = F.when(cond, F.lit(name)) if reason is None else \
            reason.when(cond, F.lit(name))
    reason = reason.otherwise(F.lit(None).cast("string"))
    return (out.withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason").isNull()))


URL_PATTERN = r"https?://([A-Za-z0-9.-]+)(/[^\s]*)?"
DEFAULT_DOMAIN_BLOCKLIST: tuple[str, ...] = (
    "spam.example.com", "ads.invalid", "tracker.test",
)


def url_domain_filter(df: DataFrame, text_col: str = "text",
                      blocklist: Sequence[str] = DEFAULT_DOMAIN_BLOCKLIST,
                      ) -> DataFrame:
    """URL/domain hygiene pass: extract every URL's host with one
    RE2-safe regex, count URLs and blocklisted-domain hits, and flag the
    doc for drop when any domain matches the blocklist (the standard
    adult/ads/tracker-domain filter of web-scraped corpora).

    The blocklist here is an in-expression literal list (fine up to a
    few thousand entries — it ships inside the serialized plan); a
    production-size list (millions of domains) becomes a broadcast-join
    dimension table against the exploded domain column instead — same
    semantics, one extra equi-join.

    Map-only regexp work in codegen. Output adds: n_urls, n_blocked,
    domains (distinct, sorted), keep."""
    domains = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1)
    blocked = F.filter(domains, lambda d: d.isin(*blocklist))
    return (df.withColumn("n_urls", F.size(domains).cast("long"))
            .withColumn("n_blocked", F.size(blocked).cast("long"))
            .withColumn("domains", F.array_sort(F.array_distinct(domains)))
            .withColumn("keep", F.size(blocked) == 0))


def pack_sequences(df: DataFrame, budget: int = 256, shards: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end in a deterministic order and cut into fixed `budget`-token
    training sequences; a document that straddles a boundary is split
    across the adjacent sequences (no padding waste — the packing is
    exactly token-dense).

    Distribution: docs are md5-sharded into `shards` independent streams
    and packed per shard, so the only non-map step is one cumulative-sum
    window per shard — `shards` bounds parallelism, so size it to the
    cluster (its fixture default is small; at 100 TB use thousands).
    Within a shard the order is (doc_id) — deterministic across engines,
    runs, and repartitions, like every sampling op here.

    Output: one row per (document x sequence it participates in):
    (shard, seq_id, id, tok_start, n_tok) where tok_start is the 1-based
    token offset inside the document and n_tok is the piece length.
    Zero-token docs pack nothing and are dropped."""
    from pyspark.sql import Window
    from filodb_spark.operators.text import token_count
    base = df.select(
        F.col(id_col),
        (split_hash(F.col(id_col)) % shards).alias("shard"),
        token_count(F.col(text_col)).alias("_n")).where(F.col("_n") > 0)
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (base.withColumn("_end", F.sum("_n").over(w))
             .withColumn("_start", F.col("_end") - F.col("_n")))
    seqs = F.sequence(F.floor(F.col("_start") / budget),
                      F.floor((F.col("_end") - 1) / budget))
    pieces = spans.select(
        "shard", F.col(id_col), "_start", "_end",
        F.explode(seqs).alias("seq_id"))
    lo = F.greatest(F.col("_start"), F.col("seq_id") * budget)
    hi = F.least(F.col("_end"), (F.col("seq_id") + 1) * budget)
    return pieces.select(
        "shard", "seq_id", id_col,
        (lo - F.col("_start") + 1).cast("long").alias("tok_start"),
        (hi - lo).cast("long").alias("n_tok"))


def token_budget_select(df: DataFrame, budget: int,
                        id_col: str = "doc_id", text_col: str = "text",
                        bands: int = 16) -> DataFrame:
    """Dataset assembly under a token budget: take documents in priority
    order (quality score desc, id asc as the deterministic tie-break)
    until the cumulative token count reaches `budget` — the selection
    step that turns "rank everything" into "ship exactly N tokens of the
    best data".

    The global ordered prefix sum is computed WITHOUT a single-partition
    window (the naive sum() OVER (ORDER BY ...) collapses 100 TB onto
    one task): quality lives in [0, 1], so docs are banded by
    floor(quality * bands) — band order is consistent with quality order
    by construction — then (a) per-band token totals (`bands` rows)
    produce each band's global offset via a window over that tiny frame,
    and (b) the within-band cumulative sum runs partitionBy(band), i.e.
    `bands`-way parallel. offset + within-band running = the exact
    global running total. At scale, raise `bands` (and/or split bands on
    a secondary hash digit) to match the cluster; the band histogram is
    the only serial state and it is O(bands).

    Output: selected docs only — (id, tok, quality, running) with
    running the global cumulative token count in priority order.
    """
    from pyspark.sql import Window
    from filodb_spark.operators.text import quality_score, token_count
    scored = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("tok"),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"))
    band = F.least(F.lit(bands - 1),
                   F.floor(F.col("quality") * bands)).cast("int")
    banded = scored.withColumn("_band", band)
    totals = banded.groupBy("_band").agg(F.sum("tok").alias("_t"))
    # offset of a band = total tokens of all STRICTLY higher bands.
    # A theta-self-join over the O(bands)-row totals frame, not a
    # global-order window — keeps the plan free of single-partition
    # window nodes even though the frame is tiny either way.
    higher = totals.select(F.col("_band").alias("_hb"),
                           F.col("_t").alias("_ht"))
    offsets = (totals.join(higher, F.col("_hb") > F.col("_band"), "left")
               .groupBy("_band")
               .agg(F.coalesce(F.sum("_ht"), F.lit(0)).alias("_off")))
    w_run = (Window.partitionBy("_band")
             .orderBy(F.col("quality").desc(), F.col(id_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = (banded.join(F.broadcast(offsets.select("_band", "_off")), "_band")
           .withColumn("running",
                       (F.col("_off") + F.sum("tok").over(w_run))
                       .cast("long")))
    return (run.where(F.col("running") <= budget)
            .select(id_col, "tok", "quality", "running"))


def incremental_dedup(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      existing_buckets: int = 8000) -> DataFrame:
    """Incremental (batch-vs-corpus) exact dedup: the steady-state shape
    of a production pipeline, where a new crawl increment is deduped
    against the already-ingested corpus rather than re-clustering
    everything. Membership is deterministic here (md5 id-bucket <
    `existing_buckets`/10000 = corpus, rest = new batch) so the oracle
    can replay it; in production the corpus side is the fingerprint
    store.

    Each batch doc gets a status:
      'new'        — fingerprint unseen in corpus AND first in batch
      'dup_corpus' — fingerprint already in the corpus store
      'dup_batch'  — repeat within the batch (a corpus-unseen
                     fingerprint's lowest-id doc wins)

    Scale shape: the corpus side is reduced to DISTINCT 16-byte
    fingerprints before the join (shuffles hashes, not documents); the
    batch-internal winner is one min-aggregation on the same key. Both
    shuffles are on md5 — uniform, skew-free.
    """
    fp = df.select(F.col(id_col),
                   F.md5(F.lower(F.regexp_replace(
                       F.trim(F.col(text_col)), r"\s+", " "))).alias("fp"),
                   split_hash(F.col(id_col)).alias("_b"))
    corpus_fps = (fp.where(F.col("_b") < existing_buckets)
                  .select("fp").distinct()
                  .withColumn("_in_corpus", F.lit(1)))
    batch = fp.where(F.col("_b") >= existing_buckets)
    first = batch.groupBy("fp").agg(F.min(id_col).alias("_first"))
    status = (F.when(F.col("_in_corpus").isNotNull(), "dup_corpus")
              .when(F.col(id_col) == F.col("_first"), "new")
              .otherwise("dup_batch"))
    return (batch.join(corpus_fps, "fp", "left")
            .join(first, "fp")
            .select(id_col, "fp", status.alias("status")))


def dataset_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Dataset-version diff: per id, 'added' (new only), 'removed'
    (old only), 'changed' (both, normalized fingerprint differs) or
    'unchanged' — the audit between two corpus snapshots that every
    dataset release pipeline publishes next to its card.

    Scale shape: both sides reduce to (id, 16-byte fingerprint) BEFORE
    the full outer join — the join moves hashes, never documents; the
    id key is unique on each side so the join is skew-free.
    """
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)),
                                        r"\s+", " ")))
    o = old.select(F.col(id_col), fp.alias("_ofp"))
    n = new.select(F.col(id_col), fp.alias("_nfp"))
    status = (F.when(F.col("_ofp").isNull(), "added")
              .when(F.col("_nfp").isNull(), "removed")
              .when(F.col("_ofp") != F.col("_nfp"), "changed")
              .otherwise("unchanged"))
    return (o.join(n, id_col, "full_outer")
            .select(id_col, status.alias("status")))


def mix_sources(df: DataFrame, weights: Mapping[str, float],
                id_col: str = "doc_id", source_col: str = "source",
                default_weight: float = 1.0) -> DataFrame:
    """Training-mixture construction: each source is up/down-weighted to
    its target epoch count — weight 2.0 repeats every doc twice, 0.5
    keeps a deterministic half, 2.25 repeats twice plus a deterministic
    quarter (the Pile/Dolma-style mixing step before tokenization).

    The fractional part reuses the md5 split-bucket hash, so the
    sampled subset NESTS as weights change and membership is stable
    across engines/runs/repartitions. Map-only: a per-row sequence
    explode, no shuffle, no RNG.

    Output: input rows with a `copy_idx` column (1..n_copies); docs
    whose source rounds down to zero copies are dropped."""
    base = None
    frac = None
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {name!r}")
        cond = F.col(source_col) == name
        k, f = int(w), w - int(w)
        base = F.when(cond, k) if base is None else base.when(cond, k)
        frac = F.when(cond, int(round(f * SPLIT_BUCKETS))) if frac is None \
            else frac.when(cond, int(round(f * SPLIT_BUCKETS)))
    dk, df_ = int(default_weight), default_weight - int(default_weight)
    base = F.lit(dk) if base is None else base.otherwise(dk)
    frac = F.lit(int(round(df_ * SPLIT_BUCKETS))) if frac is None \
        else frac.otherwise(int(round(df_ * SPLIT_BUCKETS)))
    n_copies = base + F.when(split_hash(F.col(id_col)) < frac, 1) \
        .otherwise(0)
    return (df.withColumn("copy_idx",
                          F.explode(F.when(n_copies >= 1,
                                           F.sequence(F.lit(1), n_copies))
                                    .otherwise(F.array().cast("array<int>")))))


def temperature_mix(df: DataFrame, alpha: float = 0.5,
                    budget: int | None = None, id_col: str = "doc_id",
                    source_col: str = "source") -> DataFrame:
    """Temperature-based source mixing (the T5/PaLM mixing rule,
    Raffel et al. 2020 §3.4.2: sample source s with probability
    proportional to n_s^alpha — alpha=1 is natural proportions,
    alpha->0 uniform across sources): each source gets an integer
    quota q_s = round(budget * n_s^alpha / sum_t n_t^alpha), filled
    as floor(q_s/n_s) full copies of every doc plus one extra copy
    for the q_s mod n_s docs first in md5 order — so upsampling
    (small sources) and downsampling (large sources) are both exact,
    deterministic, and NEST as the budget grows (the md5-order head
    is the same documents, the stratified_topk discipline). budget
    defaults to the corpus size (pure rebalance).

    Cross-engine determinism: the only float step is the per-source
    quota (rounded to 6 dp before the final floor(x+0.5), absorbing
    pow/sum association differences); everything after is integer
    arithmetic on md5 ranks, so the oracle reproduces rows exactly.

    Scale shape: one per-source count (driver-side model state,
    bounded by the number of sources), one md5-order row_number per
    source partition, one per-row sequence explode. No data-dependent
    driver state beyond the source histogram.

    Output: input rows + copy_idx (1..n_copies); zero-quota sources
    drop out."""
    import math

    from pyspark.sql import Window
    counts = sorted((r[source_col], r["_n"]) for r in
                    df.groupBy(source_col)
                      .agg(F.count(F.lit(1)).alias("_n")).collect())
    if not counts:
        return df.withColumn("copy_idx", F.lit(1)).limit(0)
    total = int(budget) if budget is not None \
        else sum(n for _, n in counts)
    z = sum(n ** alpha for _, n in counts)
    full_e = None
    rem_e = None
    for s, n in counts:
        quota = int(math.floor(round(total * (n ** alpha) / z, 6)
                               + 0.5))
        cond = F.col(source_col) == s
        k, r = quota // n, quota % n
        full_e = F.when(cond, k) if full_e is None else \
            full_e.when(cond, k)
        rem_e = F.when(cond, r) if rem_e is None else \
            rem_e.when(cond, r)
    full_e = full_e.otherwise(F.lit(0))
    rem_e = rem_e.otherwise(F.lit(0))
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    n_copies = full_e + F.when(F.col("_rk") <= rem_e, 1).otherwise(0)
    return (ranked.withColumn(
        "copy_idx",
        F.explode(F.when(n_copies >= 1,
                         F.sequence(F.lit(1), n_copies))
                  .otherwise(F.array().cast("array<int>"))))
        .drop("_rk"))


def source_divergence(df: DataFrame, source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Distribution-shift report: KL(source || corpus) over unigram
    token distributions — how far each source's token mix sits from the
    blend it is being mixed into (the dataset-card companion that
    catches a source of boilerplate or another language drifting in).
    KL is exact (no smoothing needed: every source token exists in the
    corpus distribution by construction).

    Shape: one (source, term) aggregation, one (term) aggregation, a
    join on the well-distributed term key, one per-source fold.
    Output: (source, n_tokens, kl) with kl rounded to 6 dp."""
    toks = df.select(F.col(source_col),
                     F.explode(tokens(F.lower(F.col(text_col)))).alias("term"))
    st = toks.groupBy(source_col, "term").agg(F.count(F.lit(1)).alias("sc"))
    ct = st.groupBy("term").agg(F.sum("sc").alias("cc"))
    s_tot = st.groupBy(source_col).agg(F.sum("sc").alias("s_n"))
    c_tot = ct.agg(F.sum("cc").alias("c_n"))
    p = F.col("sc") / F.col("s_n")           # in-source probability
    q = F.col("cc") / F.col("c_n")           # corpus probability
    return (st.join(ct, "term")
            .join(s_tot, source_col)
            .crossJoin(F.broadcast(c_tot))
            .groupBy(source_col)
            .agg(F.sum("sc").cast("long").alias("n_tokens"),
                 F.round(F.sum(p * F.log(p / q)), 6).alias("kl")))


def split_leakage(df: DataFrame, threshold: float = 0.5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Cross-split near-duplicate leakage audit: after deterministic
    train/val/test assignment, find near-dup pairs (portable
    MinHash+LSH) that STRADDLE splits — the documents that leak eval
    signal into training. This is the check assign_split's docstring
    demands ('near-dup handling must happen first'); run it after any
    split to quantify what slipped through.

    Composition of two existing operators (assign_split +
    minhash_lsh_pairs_portable) — inherits their scale shapes (map-only
    split, band-collision equi-join). Output: (d1, d2, est_jaccard,
    split1, split2), split1 != split2."""
    from filodb_spark.operators.dedup import minhash_lsh_pairs_portable
    from filodb_spark.operators.text import assign_split
    splits = assign_split(df, id_col=id_col).select(F.col(id_col), "split")
    pairs = minhash_lsh_pairs_portable(df, threshold=threshold,
                                       id_col=id_col, text_col=text_col)
    s1 = splits.select(F.col(id_col).alias("d1"),
                       F.col("split").alias("split1"))
    s2 = splits.select(F.col(id_col).alias("d2"),
                       F.col("split").alias("split2"))
    return (pairs.join(s1, "d1").join(s2, "d2")
            .where(F.col("split1") != F.col("split2"))
            .select("d1", "d2", "est_jaccard", "split1", "split2"))


def length_quantiles(df: DataFrame, group_col: str = "source",
                     text_col: str = "text",
                     qs: Sequence[float] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Exact interpolated token-length quantiles per group — the
    length-distribution panel of a dataset card (median/tail lengths
    drive chunking and packing budget choices). EXACT percentile
    (linear interpolation, identical to SQL quantile_cont) rather than
    approx_percentile: the sketch's answer is engine- and
    merge-order-dependent, the exact one is oracle-checkable; per-group
    sort cost is the trade, acceptable because groups (sources) are few
    and the sorted value is one long per doc.

    Output: (group, n_docs, q50, q90, q99)."""
    n = tokens(F.col(text_col))
    base = df.select(F.col(group_col), F.size(n).cast("long").alias("_n"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for q in qs:
        aggs.append(F.round(F.percentile(F.col("_n"), F.lit(q)), 6)
                    .alias(f"q{int(q * 100)}"))
    return base.groupBy(group_col).agg(*aggs)


def shuffle_shards(df: DataFrame, n_shards: int, seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic seeded global shuffle + shard assignment — the
    reproducible randomization every training run needs: the SAME
    (corpus, seed) must produce the SAME document order on any cluster
    size, and a different seed a statistically independent order.

    Order key = xxhash64(id, seed): pure column math, so the shuffle is
    a property of the data, not of partition layout or task scheduling
    (unlike orderBy(rand()) which is neither reproducible nor resumable).
    shard = pmod(key, n_shards); `pos` is the document's rank within its
    shard — a trainer can resume mid-shard at a known position. One
    window shuffle per shard key (parallel across shards)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window
    key = F.xxhash64(F.col(id_col), F.lit(seed))
    out = df.withColumn("_key", key) \
            .withColumn("shard", F.pmod(F.col("_key"),
                                        F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return out.withColumn("pos", F.row_number().over(w))


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          seed: int = 0, id_col: str = "doc_id",
                          mode: str = "overwrite") -> DataFrame:
    """Terminal pipeline stage: write the seeded global shuffle as one
    parquet file per shard directory (`shard=k/part-*.parquet`), rows
    stored in shuffle order, and return the written artifact's MANIFEST
    computed by RE-READING the output (so it certifies the files on
    disk, not the plan): (shard, rows, key_xor, first_id, last_id).

    key_xor is the bit-XOR of the shard's order keys — order-insensitive
    and collision-resistant enough to detect a dropped/duplicated row;
    with the row count it pins shard content across environments. A
    re-run with the same (corpus, seed, n_shards) reproduces the
    manifest bit-for-bit; any upstream change breaks it loudly.

    Each shard lives in exactly ONE task partition (repartition on the
    shard column), so each `shard=` directory holds exactly one data
    file — the unit a data-loader worker maps to."""
    sh = shuffle_shards(df, n_shards, seed, id_col)
    (sh.repartition(n_shards, F.col("shard"))
       .sortWithinPartitions("shard", "_key", id_col)
       .write.mode(mode).partitionBy("shard").parquet(path))
    back = df.sparkSession.read.parquet(path)
    return (back.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.expr("bit_xor(_key)").alias("key_xor"),
                 F.min_by(F.col(id_col), F.col("_key")).alias("first_id"),
                 F.max_by(F.col(id_col), F.col("_key")).alias("last_id"))
            .orderBy("shard"))


def read_training_shard(spark, path: str, shard: int,
                        from_pos: int = 1) -> DataFrame:
    """Data-loader view of one shard, in stored shuffle order, resuming
    at `from_pos` (1-based, the `pos` column) — the partition filter
    prunes every other shard's directory at planning time."""
    return (spark.read.parquet(path)
            .where(F.col("shard") == shard)
            .where(F.col("pos") >= from_pos)
            .orderBy("pos"))


def dataset_card(df: DataFrame, dims: Sequence[str] = ("lang", "source"),
                 chars_col: str = "n_chars") -> DataFrame:
    """Dataset-card rollup: doc counts and char volumes at every
    combination of the card dimensions (full cube, so one pass serves
    the per-lang table, the per-source table, and the grand total).
    Spark's cube is partial-aggregate friendly — one shuffle at the
    combined grouping-set key."""
    return (df.cube(*dims)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(chars_col)).cast("long").alias("total_chars"),
                 F.round(F.avg(F.col(chars_col)), 6).alias("avg_chars")))
