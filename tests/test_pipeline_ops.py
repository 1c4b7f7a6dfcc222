"""Training-data pipeline operators: contamination, repetition, PII
scrub, stratified sampling, quality gate, dataset card, quantization.

Driver-gate oracles check cross-engine exactness; these tests pin the
operator-level semantics on small hand-built frames."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.pipeline import (contamination_check,
                                             dataset_card, ngram_repetition,
                                             pii_scrub, quality_filter,
                                             stratified_sample,
                                             stratified_topk, word_ngrams)


class TestNgrams:
    def test_word_ngrams_and_short_doc(self, spark):
        df = spark.createDataFrame([(1, "A b c d"), (2, "x"), (3, " ")],
                                   ["doc_id", "text"])
        out = {r.doc_id: list(r.g) for r in
               df.select("doc_id",
                         word_ngrams(F.col("text"), 3).alias("g")).collect()}
        assert out[1] == ["a b c", "b c d"]   # lowercased, sliding
        assert out[2] == [] and out[3] == []

    def test_repetition_fractions(self, spark):
        df = spark.createDataFrame(
            [(1, "spam spam spam spam"),     # all bigrams identical
             (2, "all words here differ")],
            ["doc_id", "text"])
        out = {r.doc_id: (r.dup2_frac, r.dup3_frac)
               for r in ngram_repetition(df).collect()}
        # 3 bigrams, 1 distinct -> 2/3; 2 trigrams, 1 distinct -> 1/2
        assert out[1] == (round(2 / 3, 6), 0.5)
        assert out[2] == (0.0, 0.0)


class TestContamination:
    def test_hits_and_misses(self, spark):
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps"),
             (2, "totally novel training text here"),
             (3, "too short")],
            ["doc_id", "text"])
        bench = spark.createDataFrame(
            [(100, "we saw the quick brown fox jumps over it")],
            ["doc_id", "text"])
        out = {r.doc_id: r for r in
               contamination_check(docs, bench, n=5).collect()}
        assert out[1].n_hits == 1 and out[1].contamination == 1.0
        assert out[2].n_hits == 0 and out[2].contamination == 0.0
        assert out[3].n_grams == 0 and out[3].contamination == 0.0

    def test_shuffle_join_variant_same_result(self, spark):
        docs = spark.createDataFrame(
            [(i, f"shared prefix tokens one two three w{i}")
             for i in range(6)], ["doc_id", "text"])
        bench = docs.where(F.col("doc_id") == 0)
        a = sorted(map(tuple, contamination_check(docs, bench, n=4).collect()))
        b = sorted(map(tuple, contamination_check(
            docs, bench, n=4, broadcast_benchmark=False).collect()))
        assert a == b


class TestPiiScrub:
    def test_each_type_detected_and_redacted(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a.b+c@x-corp.io or 10.1.2.3 ssn 123-45-6789 "
                 "tel +1 555 123 4567 end"),
             (2, "clean text, no identifiers at all")],
            ["doc_id", "text"])
        out = {r.doc_id: r for r in pii_scrub(df).collect()}
        r = out[1]
        assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (1, 1, 1, 1)
        assert r.n_pii == 4
        assert r.redacted == ("mail <EMAIL> or <IP> ssn <SSN> "
                              "tel <PHONE> end")
        assert out[2].n_pii == 0 and out[2].redacted == df.collect()[1].text \
            or out[2].redacted == "clean text, no identifiers at all"

    def test_order_prevents_double_count(self, spark):
        # the digits inside an email's domain must not count as a phone
        df = spark.createDataFrame([(1, "x 123456789@mail99.com y")],
                                   ["doc_id", "text"])
        r = pii_scrub(df).first()
        assert r.n_email == 1 and r.n_phone == 0


class TestSampling:
    def test_stratified_sample_fractions_and_nesting(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        half = stratified_sample(df, "lang", {"en": 0.5, "de": 0.25})
        counts = {r.lang: r.n for r in
                  half.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["en"] / 2000 - 0.5) < 0.05
        assert abs(counts["de"] / 2000 - 0.25) < 0.05
        # nesting: the 25% en-sample is a subset of the 50% en-sample
        quarter = stratified_sample(df, "lang", {"en": 0.25, "de": 0.25})
        h = {r.doc_id for r in half.where(F.col("lang") == "en").collect()}
        q = {r.doc_id for r in quarter.where(F.col("lang") == "en").collect()}
        assert q <= h

    def test_stratified_topk_exact_k_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, ["a", "b", "c"][i % 3]) for i in range(300)],
            ["doc_id", "lang"])
        out1 = stratified_topk(df, "lang", k=4).collect()
        out2 = stratified_topk(df.repartition(7), "lang", k=4).collect()
        by_lang: dict = {}
        for r in out1:
            by_lang.setdefault(r.lang, set()).add(r.doc_id)
        assert all(len(v) == 4 for v in by_lang.values())
        assert sorted((r.lang, r.doc_id) for r in out1) == \
            sorted((r.lang, r.doc_id) for r in out2)


class TestQualityAndCard:
    def test_first_failing_rule_wins(self, spark):
        df = spark.createDataFrame(
            [(1, "short"),                                  # too_short
             (2, " ".join(f"w{i}" for i in range(50))),     # ok
             (3, " ".join(["dup dup dup"] * 20))],          # repetitive
            ["doc_id", "text"])
        out = {r.doc_id: (r.keep, r.drop_reason)
               for r in quality_filter(df, min_tokens=10, min_quality=0.0,
                                       max_dup3=0.2).collect()}
        assert out[1] == (False, "too_short")
        assert out[2] == (True, None)
        assert out[3] == (False, "repetitive")

    def test_dataset_card_cube_totals(self, spark):
        df = spark.createDataFrame(
            [(1, "en", "s1", 10), (2, "en", "s2", 20), (3, "de", "s1", 30)],
            ["doc_id", "lang", "source", "n_chars"])
        rows = {(r.lang, r.source): (r.n_docs, r.total_chars)
                for r in dataset_card(df).collect()}
        assert rows[(None, None)] == (3, 60)        # grand total
        assert rows[("en", None)] == (2, 30)        # per-lang subtotal
        assert rows[(None, "s1")] == (2, 40)        # per-source subtotal
        assert rows[("en", "s2")] == (1, 20)        # leaf


class TestQuantize:
    def test_roundtrip_error_bound_and_constant_vector(self, spark):
        from filodb_spark.operators.similarity import quantize_embeddings
        df = spark.createDataFrame(
            [(1, [0.0, 1.0, 2.0, 255.0]), (2, [5.0, 5.0, 5.0, 5.0])],
            ["vec_id", "embedding"])
        out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
        r1 = out[1]
        assert r1.codes == [0, 1, 2, 255]
        assert r1.vmin == 0.0 and r1.scale == 1.0
        # error bounded by scale/2
        assert r1.max_abs_err <= r1.scale / 2 + 1e-9
        r2 = out[2]
        assert r2.codes == [0, 0, 0, 0] and r2.scale == 0.0
        assert r2.max_abs_err == 0.0


class TestUrlDomainFilter:
    def test_extract_block_and_keep(self, spark):
        from filodb_spark.operators.pipeline import url_domain_filter
        df = spark.createDataFrame(
            [(1, "see https://ok.example.org/a and http://spam.example.com"),
             (2, "no links here"),
             (3, "dup https://ok.example.org/x https://ok.example.org/y")],
            ["doc_id", "text"])
        out = {r.doc_id: r for r in url_domain_filter(df).collect()}
        assert out[1].n_urls == 2 and out[1].n_blocked == 1
        assert not out[1].keep
        assert list(out[1].domains) == ["ok.example.org", "spam.example.com"]
        assert out[2].n_urls == 0 and out[2].keep
        # distinct domains, but every URL counted
        assert out[3].n_urls == 2 and list(out[3].domains) == ["ok.example.org"]
        assert out[3].keep


class TestPackSequences:
    def _df(self, spark, docs):
        return spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n)))
             for i, n in docs], ["doc_id", "text"])

    def test_boundary_split_single_shard(self, spark):
        from filodb_spark.operators.pipeline import pack_sequences
        # shards=1 -> order is doc_id; budget 5 over docs of 3,4,2 tokens
        df = self._df(spark, [(1, 3), (2, 4), (3, 2)])
        rows = sorted((r.seq_id, r.doc_id, r.tok_start, r.n_tok)
                      for r in pack_sequences(df, budget=5,
                                              shards=1).collect())
        assert rows == [
            (0, 1, 1, 3),            # doc1 fully in seq 0
            (0, 2, 1, 2),            # doc2 splits across the boundary
            (1, 2, 3, 2),
            (1, 3, 1, 2),            # doc3 fully in seq 1
        ]

    def test_token_conservation_and_density(self, spark):
        from filodb_spark.operators.pipeline import pack_sequences
        from filodb_spark.operators.text import token_count
        df = self._df(spark, [(i, 1 + (i * 7) % 13) for i in range(40)])
        out = pack_sequences(df, budget=16, shards=3)
        # every token of every doc lands in exactly one piece
        per_doc = {r.doc_id: r.s for r in
                   out.groupBy("doc_id").agg(F.sum("n_tok").alias("s"))
                   .collect()}
        want = {r.doc_id: r.n for r in
                df.select("doc_id",
                          token_count(F.col("text")).alias("n")).collect()}
        assert per_doc == want
        # sequences are token-dense: every seq but the shard-final one
        # holds exactly `budget` tokens
        seqs = (out.groupBy("shard", "seq_id")
                .agg(F.sum("n_tok").alias("s")).collect())
        last = {}
        for r in seqs:
            last[r.shard] = max(last.get(r.shard, -1), r.seq_id)
        for r in seqs:
            if r.seq_id != last[r.shard]:
                assert r.s == 16, (r.shard, r.seq_id, r.s)
            else:
                assert r.s <= 16

    def test_empty_docs_dropped(self, spark):
        from filodb_spark.operators.pipeline import pack_sequences
        df = spark.createDataFrame([(1, ""), (2, "a b")],
                                   ["doc_id", "text"])
        rows = pack_sequences(df, budget=4, shards=1).collect()
        assert [(r.doc_id, r.n_tok) for r in rows] == [(2, 2)]


class TestMixSources:
    def test_integer_and_fractional_weights(self, spark):
        from filodb_spark.operators.pipeline import mix_sources
        from filodb_spark.operators.text import SPLIT_BUCKETS, split_hash
        df = spark.createDataFrame(
            [(i, "a" if i < 10 else "b") for i in range(20)],
            ["doc_id", "source"])
        out = mix_sources(df, {"a": 2.0, "b": 0.5}, default_weight=1.0)
        rows = [(r.doc_id, r.copy_idx) for r in out.collect()]
        a_rows = [r for r in rows if r[0] < 10]
        # every 'a' doc exactly twice, copy_idx 1..2
        assert len(a_rows) == 20
        assert sorted(set(c for _, c in a_rows)) == [1, 2]
        # 'b' docs kept iff md5-bucket < 5000 — recompute expectation
        buckets = {r.doc_id: r.b for r in
                   df.select("doc_id",
                             split_hash(F.col("doc_id")).alias("b"))
                   .collect()}
        want_b = {i for i in range(10, 20) if buckets[i] < SPLIT_BUCKETS / 2}
        assert {d for d, _ in rows if d >= 10} == want_b

    def test_fraction_nests_as_weight_grows(self, spark):
        from filodb_spark.operators.pipeline import mix_sources
        df = spark.createDataFrame([(i, "s") for i in range(100)],
                                   ["doc_id", "source"])
        keep25 = {r.doc_id for r in mix_sources(df, {"s": 0.25}).collect()}
        keep50 = {r.doc_id for r in mix_sources(df, {"s": 0.5}).collect()}
        assert keep25 <= keep50

    def test_negative_weight_rejected(self, spark):
        from filodb_spark.operators.pipeline import mix_sources
        df = spark.createDataFrame([(1, "s")], ["doc_id", "source"])
        with pytest.raises(ValueError):
            mix_sources(df, {"s": -1.0})


class TestSourceDivergence:
    def test_identical_source_has_zero_kl(self, spark):
        from filodb_spark.operators.pipeline import source_divergence
        # both sources share one token distribution -> corpus == source
        df = spark.createDataFrame(
            [(1, "a", "x y"), (2, "a", "x y"), (3, "b", "x y"), (4, "b", "x y")],
            ["doc_id", "source", "text"])
        out = {r.source: r for r in source_divergence(df).collect()}
        assert out["a"].kl == 0.0 and out["b"].kl == 0.0
        assert out["a"].n_tokens == 4

    def test_skewed_source_positive_kl(self, spark):
        import math
        from filodb_spark.operators.pipeline import source_divergence
        df = spark.createDataFrame(
            [(1, "a", "x x"), (2, "b", "y y")],
            ["doc_id", "source", "text"])
        out = {r.source: r.kl for r in source_divergence(df).collect()}
        # p(x|a)=1, q(x)=0.5 -> KL = ln 2
        assert out["a"] == round(math.log(2), 6)
        assert out["b"] == round(math.log(2), 6)


class TestSplitLeakage:
    def test_only_cross_split_pairs_survive(self, spark):
        from filodb_spark.operators.pipeline import split_leakage
        from filodb_spark.operators.text import assign_split
        # many identical docs: every pair is a near-dup; ids chosen so
        # splits differ for at least one pair
        df = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in
             range(40)], ["doc_id", "text"])
        out = split_leakage(df, threshold=0.5).collect()
        splits = {r.doc_id: r.split for r in assign_split(df).collect()}
        assert len(out) > 0
        for r in out:
            assert r.split1 != r.split2
            assert splits[r.d1] == r.split1 and splits[r.d2] == r.split2


class TestLengthQuantiles:
    def test_exact_interpolated_percentiles(self, spark):
        from filodb_spark.operators.pipeline import length_quantiles
        # group 'a': lengths 1..5 -> p50 = 3, p90 = 4.6 (type-7 interp)
        rows = [(i, "a", " ".join(["w"] * n))
                for i, n in enumerate([1, 2, 3, 4, 5])]
        rows.append((9, "b", "w w"))
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = {r.source: r for r in length_quantiles(df).collect()}
        assert out["a"].n_docs == 5
        assert out["a"].q50 == 3.0
        assert out["a"].q90 == 4.6
        assert out["b"].q99 == 2.0


class TestTrainingShards:
    """Seeded global shuffle writer: reproducible across runs and
    cluster layouts, one file per shard, resumable in-order reads."""

    def _docs(self, spark, n=500):
        from pyspark.sql import functions as F
        return spark.range(n).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("text "), F.col("id")).alias("text"))

    def test_shuffle_deterministic_and_seeded(self, spark):
        from filodb_spark.operators.pipeline import shuffle_shards
        docs = self._docs(spark)
        a = shuffle_shards(docs, 4, seed=1).select(
            "shard", "pos", "doc_id").collect()
        b = shuffle_shards(docs.repartition(13), 4, seed=1).select(
            "shard", "pos", "doc_id").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        c = shuffle_shards(docs, 4, seed=2).select(
            "shard", "pos", "doc_id").collect()
        assert sorted(map(tuple, a)) != sorted(map(tuple, c))
        # every shard's pos is a dense 1..k ranking
        by_shard = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))

    def test_write_manifest_reproducible(self, spark, tmp_path):
        from filodb_spark.operators.pipeline import write_training_shards
        docs = self._docs(spark)
        m1 = [tuple(r) for r in write_training_shards(
            docs, str(tmp_path / "w1"), 4, seed=7).collect()]
        m2 = [tuple(r) for r in write_training_shards(
            docs.repartition(17), str(tmp_path / "w2"), 4, seed=7).collect()]
        assert m1 == m2 and len(m1) == 4
        assert sum(r[1] for r in m1) == 500
        # a corpus change breaks the manifest loudly
        m3 = [tuple(r) for r in write_training_shards(
            docs.where("doc_id != 'doc-7'"), str(tmp_path / "w3"), 4,
            seed=7).collect()]
        assert m1 != m3

    def test_one_file_per_shard_and_resume(self, spark, tmp_path):
        import glob
        from filodb_spark.operators.pipeline import (read_training_shard,
                                                     write_training_shards)
        path = str(tmp_path / "shards")
        write_training_shards(self._docs(spark), path, 4, seed=3)
        for k in range(4):
            files = glob.glob(f"{path}/shard={k}/*.parquet")
            assert len(files) == 1, (k, files)
        full = [r["doc_id"] for r in
                read_training_shard(spark, path, 2).collect()]
        resumed = [r["doc_id"] for r in
                   read_training_shard(spark, path, 2,
                                       from_pos=11).collect()]
        assert resumed == full[10:] and len(full) > 20
        # partition pruning reaches the scan
        plan = read_training_shard(spark, path, 2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan


class TestC4LineClean:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2), pinned
    against a pure-Python golden of the same rules."""

    @staticmethod
    def _golden(text, min_words=5, min_kept_lines=3):
        import re
        lines = text.split("\n")
        kept = []
        for x in lines:
            r = x.rstrip(" ")
            tx = x.strip(" ")
            wc = 0 if not tx else len(re.split(r"[ \t]+", tx))
            if (r[-1:] in (".", "!", "?", '"') and wc >= min_words
                    and "javascript" not in x.lower()):
                kept.append(x)
        keep = (len(kept) >= min_kept_lines
                and "lorem ipsum" not in text.lower()
                and "{" not in text)
        return (len(lines), len(kept), "\n".join(kept), keep)

    TEXTS = [
        "Good first sentence with plenty of words here.\n"
        "short line.\n"
        "No terminal punctuation on this perfectly long line\n"
        'Quoted line endings also count as terminal marks."\n'
        "Enable javascript to continue reading this excellent page.\n"
        "Final sentence closes the page with enough words!",
        "lorem ipsum dolor sit amet and then some more words here.\n"
        "A second fully valid sentence with many words too.",
        "brace of code { inline }\nOne good long sentence is not enough.",
        "   \nOnly whitespace and empties\n\n.",
        "Tab\tseparated words still count toward the minimum fine.",
    ]

    def test_matches_golden(self, spark):
        from filodb_spark.operators.pipeline import c4_line_clean
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_lines"], r["n_lines_kept"],
                             r["cleaned_text"], r["keep"])
               for r in c4_line_clean(df, min_words=5,
                                      min_kept_lines=2).collect()}
        for i, t in enumerate(self.TEXTS):
            want = self._golden(t, 5, 2)
            assert got[i] == want, (i, got[i], want)
        # doc 0: javascript + no-punct + short lines dropped, 3 kept
        assert got[0][1] == 3 and got[0][3] is True
        # doc 1: clean lines but the page-level lorem-ipsum tell kills it
        assert got[1][1] == 2 and got[1][3] is False
        # doc 2: '{' kills the page
        assert got[2][3] is False

    def test_line_rules_individually(self, spark):
        from filodb_spark.operators.pipeline import c4_line_clean
        df = spark.createDataFrame(
            [(0, "one two three four.\none two three four five.")],
            "doc_id long, text string")
        r = c4_line_clean(df, min_words=5, min_kept_lines=1).first()
        assert r["n_lines_kept"] == 1        # 4-word line dropped
        assert r["cleaned_text"] == "one two three four five."
        r = c4_line_clean(df, min_words=4, min_kept_lines=2).first()
        assert r["n_lines_kept"] == 2 and r["keep"] is True

    def test_plan_is_map_only(self, spark):
        """The 100 TB shape: both line-level ops are pure column
        expressions — one column-pruned scan, NO exchange, no Python
        in the plan."""
        from filodb_spark.operators.pipeline import (c4_line_clean,
                                                     gopher_quality)
        df = spark.createDataFrame([(0, "a line of words here.")],
                                   "doc_id long, text string")
        for op in (c4_line_clean, gopher_quality):
            plan = op(df)._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, (op.__name__, plan)
            assert "Python" not in plan, (op.__name__, plan)


class TestGopherQuality:
    """Gopher quality rules (Rae et al. 2021 A1.1) pinned against a
    pure-Python golden; first-failing-rule reason order."""

    @staticmethod
    def _golden_signals(text):
        import re
        tx = text.strip(" ")
        words = re.split(r"[ \t\n]+", tx) if tx else []
        n = len(words)
        mean_wl = round(sum(len(w) for w in words) / n, 6) if n else None
        n_sym = (text.count("#")
                 + (len(text) - len(text.replace("...", ""))) // 3
                 + text.count("…"))
        sym = round(n_sym / n, 6) if n else None
        lines = text.split("\n")
        nb = sum(1 for x in lines
                 if x.lstrip(" ")[:1] in ("-", "*", "•"))
        ne = sum(1 for x in lines
                 if x.rstrip(" ").endswith("...")
                 or x.rstrip(" ").endswith("…"))
        alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
        stops = {w.lower() for w in words} & {
            "the", "be", "to", "of", "and", "that", "have", "with"}
        return (n, mean_wl, sym, round(nb / len(lines), 6),
                round(ne / len(lines), 6),
                round(alpha / n, 6) if n else None, len(stops))

    TEXTS = [
        "the cat and the dog walk to town with all of that gear today",
        "- bullet one\n- bullet two\n- bullet three\nthe of and",
        "trailing off...\nmore trailing…\nthe be to of and solid line",
        "#### #tag the of ... and … to be",
        "12345 67890 +++ ---- the of to",
    ]

    def test_signals_match_golden(self, spark):
        from filodb_spark.operators.pipeline import gopher_quality
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_words"], r["mean_word_len"],
                             r["symbol_ratio"], r["frac_bullet_lines"],
                             r["frac_ellipsis_lines"],
                             r["frac_alpha_words"], r["n_stop_hits"])
               for r in gopher_quality(df).collect()}
        for i, t in enumerate(self.TEXTS):
            assert got[i] == self._golden_signals(t), (i, got[i])

    def test_rule_order_and_keep(self, spark):
        from filodb_spark.operators.pipeline import gopher_quality
        long_ok = " ".join(["the", "of", "and"] * 5
                           + ["solid", "words", "here"] * 15)
        df = spark.createDataFrame(
            [(0, long_ok),                       # passes everything
             (1, "short doc"),                   # too_few_words first
             (2, " ".join(["x"] * 60)),          # word_length (mean 1)
             (3, " ".join(["#"] * 60)),          # word_length fires
                                                 # before symbol_ratio
             (4, "\n".join(["- bullets carry longer words"] * 30)
                 + "\n" + " ".join(["the of and that"] * 12))],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["drop_reason"], r["keep"])
               for r in gopher_quality(df, min_words=20).collect()}
        assert got[0] == (None, True)
        assert got[1] == ("too_few_words", False)
        assert got[2] == ("word_length", False)
        assert got[3] == ("word_length", False)
        assert got[4][0] == "bullet_lines" and got[4][1] is False


class TestC4SpanDedup:
    """C4 repeated-span dedup (Raffel et al. 2020 §2.2) against a
    pure-Python golden of the same rules: global fingerprint of every
    `span`-line window, canonical occurrence = lowest (doc_id, start),
    all other occurrences lose their lines."""

    @staticmethod
    def _golden(texts, span=3):
        docs = {i: t.split("\n") for i, t in texts}
        occ = {}
        for i in sorted(docs):
            lines = docs[i]
            for j in range(len(lines) - span + 1):
                key = "\n".join(lines[j:j + span])
                occ.setdefault(key, []).append((i, j))
        rm = {i: set() for i in docs}
        for places in occ.values():
            if len(places) > 1:
                for (i, j) in places[1:]:
                    rm[i].update(range(j, j + span))
        out = {}
        for i, lines in docs.items():
            kept = [x for p, x in enumerate(lines) if p not in rm[i]]
            out[i] = (len(lines), len(kept), "\n".join(kept))
        return out

    TEXTS = [
        (0, "unique alpha\nshared one\nshared two\nshared three\ntail"),
        (1, "other beta\nshared one\nshared two\nshared three\ntail b"),
        (2, "gamma\ndelta"),                    # fewer lines than span
        (3, "shared one\nshared two\nshared three"),   # pure dup doc
        (4, ""),                                # empty text: one line
        (5, "rep\nrep\nrep\nrep\nrep\nrep"),    # intra-doc duplicate
    ]

    def test_matches_golden(self, spark):
        from filodb_spark.operators.pipeline import c4_span_dedup
        df = spark.createDataFrame(self.TEXTS,
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["n_lines"], r["n_lines_kept"],
                             r["cleaned_text"])
               for r in c4_span_dedup(df, span=3).collect()}
        assert got == self._golden(self.TEXTS, 3)
        # the canonical doc kept everything; the non-canonical copies
        # lost exactly the shared block
        assert got[0][1] == 5
        assert got[1] == (5, 2, "other beta\ntail b")
        assert got[3] == (3, 0, "")
        # intra-doc: ('rep','rep','rep') occurs at starts 0..3; the
        # canonical start-0 occurrence survives but the non-canonical
        # ones at starts 1..3 cover lines 1..5, so only line 0 is left
        # (C4's removal is occurrence-coarse, not line-minimal)
        assert got[5] == (6, 1, "rep")

    def test_span_width_param(self, spark):
        from filodb_spark.operators.pipeline import c4_span_dedup
        df = spark.createDataFrame(self.TEXTS,
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["n_lines"], r["n_lines_kept"],
                             r["cleaned_text"])
               for r in c4_span_dedup(df, span=2).collect()}
        assert got == self._golden(self.TEXTS, 2)


class TestCcnetBuckets:
    """CCNet per-language perplexity bucketing (Wenzek et al. 2020):
    thirds by the corpus-unigram score, per language."""

    def test_thirds_per_language(self, spark):
        from filodb_spark.operators.pipeline import ccnet_ppl_buckets
        # lang 'a': 9 docs with clearly ordered scores — docs built
        # from common vs rare vocabulary; lang 'b': its own thresholds
        rows = []
        for i in range(9):
            # more repetitions of the corpus-common word -> higher
            # unigram log-prob
            common = " ".join(["common"] * (i + 1))
            rare = f"rare{i}"
            rows.append((i, "a", f"{common} {rare}"))
        rows += [(10, "b", "common common common"),
                 (11, "b", "solo11 solo12 solo13"),
                 (12, "b", "common solo14"),
                 (13, "b", "")]            # empty: NULL bucket
        df = spark.createDataFrame(rows,
                                   "doc_id long, lang string, text string")
        out = {r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
               for r in ccnet_ppl_buckets(df).collect()}
        a = [(i, out[i][1]) for i in range(9)]
        a_sorted = sorted(a, key=lambda x: x[1])
        # per-lang thirds: lowest third tail, highest third head
        tails = {i for i, _ in a_sorted[:3]}
        heads = {i for i, _ in a_sorted[-3:]}
        for i in range(9):
            want = ("tail" if i in tails else
                    "head" if i in heads else "middle")
            assert out[i][0] == want, (i, out[i], want)
        # lang b gets its OWN thresholds: best doc is head, worst tail
        b = sorted(((i, out[i][1]) for i in (10, 11, 12)),
                   key=lambda x: x[1])
        assert out[b[-1][0]][0] == "head"
        assert out[b[0][0]][0] == "tail"
        assert out[13] == (None, None)

    def test_boundary_is_inclusive(self, spark):
        """Docs exactly AT a rounded threshold land in the upper
        bucket (>=), the same comparison the oracle runs."""
        from filodb_spark.operators.pipeline import ccnet_ppl_buckets
        # three identical docs: every score equals both thresholds ->
        # everything is head
        df = spark.createDataFrame(
            [(i, "x", "same text here") for i in range(3)],
            "doc_id long, lang string, text string")
        out = {r["doc_id"]: r["ppl_bucket"]
               for r in ccnet_ppl_buckets(df).collect()}
        assert set(out.values()) == {"head"}


class TestGopherRepetition:
    """Gopher repetition-removal rules (Rae et al. 2021 A1.1) pinned
    against a pure-Python golden of the documented definitions."""

    @staticmethod
    def _golden(text, ns=(2, 3, 4)):
        import re
        from collections import Counter
        lines = text.split("\n")
        nl, nd = len(lines), len(set(lines))
        tot = sum(len(x) for x in lines)
        dtot = sum(len(x) for x in set(lines))
        frac_dup = round((nl - nd) / nl, 6)
        frac_dup_chars = round((tot - dtot) / tot, 6) if tot else 0.0
        nonspace = len(re.sub(r"\s+", "", text.strip()))
        toks = text.strip().lower().split()
        res = [frac_dup, frac_dup_chars]
        for n in ns:
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            if grams and nonspace:
                c = Counter(grams)
                best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
                g, cnt = best[0], best[1]
                res.append(round(cnt * len(g.replace(" ", ""))
                                 / nonspace, 6))
            else:
                res.append(0.0)
        return tuple(res)

    TEXTS = [
        "one two three\none two three\nunique line here",   # dup lines
        "spam spam spam spam spam",                         # top-ngrams
        "all fresh lines\nwith different words\nno repeats at all",
        "a\na\na\na",                                       # tiny dups
        # exactly three words: 2- and 3-gram panels fire, the 4-gram
        # panel has no grams — pins the fused single-pass panel's
        # per-n null path (r13 rewrite: one tagged pass, not one per n)
        "just three words",
    ]

    def test_signals_match_golden(self, spark):
        from filodb_spark.operators.pipeline import gopher_repetition
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["frac_dup_lines"],
                             r["frac_dup_line_chars"],
                             r["top2gram_char_frac"],
                             r["top3gram_char_frac"],
                             r["top4gram_char_frac"])
               for r in gopher_repetition(df).collect()}
        for i, t in enumerate(self.TEXTS):
            assert got[i] == self._golden(t), (i, got[i],
                                               self._golden(t))

    def test_rule_order_and_keep(self, spark):
        from filodb_spark.operators.pipeline import gopher_repetition
        df = spark.createDataFrame(
            [(0, "fine first line\nsecond differs\nthird also differs"),
             (1, "dup\ndup\ndup\nonly one unique line"),   # dup_lines
             (2, "spam spam spam spam spam spam")],        # top2gram
            "doc_id long, text string")
        got = {r["doc_id"]: (r["drop_reason"], r["keep"])
               for r in gopher_repetition(df).collect()}
        assert got[1][0] == "dup_lines" and got[1][1] is False
        assert got[2][0] == "top2gram" and got[2][1] is False


class TestTemperatureMix:
    """T5-style temperature mixing against a pure-Python golden: exact
    integer quotas from n^alpha proportions, md5-order head for the
    fractional part, budget nesting."""

    @staticmethod
    def _golden(rows, alpha, budget=None):
        import hashlib
        import math
        from collections import Counter
        counts = Counter(s for _, s in rows)
        total = budget if budget is not None else len(rows)
        z = sum(n ** alpha for n in counts.values())
        out = Counter()
        for s, n in counts.items():
            quota = int(math.floor(round(total * (n ** alpha) / z, 6)
                                   + 0.5))
            k, r = quota // n, quota % n
            order = sorted((i for i, src in rows if src == s),
                           key=lambda i: (hashlib.md5(
                               str(i).encode()).hexdigest(), i))
            for rank, i in enumerate(order, 1):
                c = k + (1 if rank <= r else 0)
                if c:
                    out[(i, s)] = c
        return out

    def test_quotas_and_md5_head(self, spark):
        from filodb_spark.operators.pipeline import temperature_mix
        rows = [(i, "big") for i in range(90)] + \
               [(100 + i, "small") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        for alpha in (1.0, 0.5, 0.0):
            got = {}
            for r in temperature_mix(df, alpha=alpha).collect():
                got[(r["doc_id"], r["source"])] = \
                    got.get((r["doc_id"], r["source"]), 0) + 1
            want = self._golden(rows, alpha)
            assert got == dict(want), alpha
        # alpha=1 is (up to rounding) the natural proportions
        n1 = sum(self._golden(rows, 1.0).values())
        assert abs(n1 - 100) <= 2
        # alpha=0 pushes toward uniform: the small source upsamples
        g0 = self._golden(rows, 0.0)
        small_copies = sum(c for (i, s), c in g0.items()
                           if s == "small")
        assert small_copies > 10 * 3     # 10 docs upsampled ~5x

    def test_budget_nesting(self, spark):
        """The md5-order head nests: every (doc, copy) present at a
        smaller budget is present at a larger one."""
        from filodb_spark.operators.pipeline import temperature_mix
        rows = [(i, ["a", "b"][i % 2]) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string")

        def multiset(budget):
            out = {}
            for r in temperature_mix(df, alpha=0.5,
                                     budget=budget).collect():
                key = (r["doc_id"], r["source"])
                out[key] = out.get(key, 0) + 1
            return out

        small, large = multiset(20), multiset(40)
        assert all(large.get(k, 0) >= c for k, c in small.items())
