"""Round-3 second-batch operators: deterministic k-means, token-budget
selection, incremental dedup, two-phase LSH-verified near-dup pairs.

Driver-gate oracles check cross-engine exactness at sf0.01; these pin
operator-level semantics on small hand-built frames, including the edge
cases the fixtures never hit (empty clusters, budget boundaries,
batch-internal duplicate chains)."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.dedup import lsh_verified_pairs, \
    minhash_lsh_pairs_portable, ngram_jaccard_pairs
from filodb_spark.operators.pipeline import incremental_dedup, \
    token_budget_select
from filodb_spark.operators.similarity import kmeans_portable


@pytest.mark.slow
class TestKMeansPortable:
    def test_two_obvious_clusters(self, spark):
        pts = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.5, 0.0]),
               (3, [9.5, 10.0]), (4, [0.0, 0.5]), (5, [10.0, 9.0])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        out = {r["vec_id"]: r["cluster"]
               for r in kmeans_portable(df, k=2, iterations=2).collect()}
        # seeds: id 0 -> cluster 0, id 1 -> cluster 1
        assert {i for i, c in out.items() if c == 0} == {0, 2, 4}
        assert {i for i, c in out.items() if c == 1} == {1, 3, 5}

    def test_dist2_is_squared_l2_to_final_centroid(self, spark):
        pts = [(0, [0.0, 0.0]), (1, [4.0, 0.0]), (2, [2.0, 0.0])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        rows = {r["vec_id"]: r for r in
                kmeans_portable(df, k=1, iterations=1).collect()}
        # single cluster: centroid = mean = (2, 0); dist2 = (x-2)^2
        assert rows[0]["dist2"] == pytest.approx(4.0, abs=1e-6)
        assert rows[2]["dist2"] == pytest.approx(0.0, abs=1e-6)

    def test_empty_cluster_drops_out(self, spark):
        # seeds = ids 0,1,2; seed 2 duplicates seed 0's position, so the
        # (dist2, cluster) tie-break sends every point — including the
        # seed itself — to cluster 0, and cluster 2 empties in round 1
        pts = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 0.0]),
               (3, [0.2, 0.0]), (4, [9.8, 0.0]), (5, [3.4, 0.0])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        out = kmeans_portable(df, k=3, iterations=3)
        clusters = {r["cluster"] for r in out.collect()}
        assert out.count() == 6          # every vector still assigned
        assert 2 not in clusters         # cluster 2 emptied and vanished

    def test_more_iterations_refine_not_crash(self, spark):
        pts = [(i, [float(i % 3), float(i // 3)]) for i in range(9)]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        a1 = kmeans_portable(df, k=3, iterations=1)
        a4 = kmeans_portable(df, k=3, iterations=4)
        assert a1.count() == a4.count() == 9


def _doc(tokens_n: int, word: str = "word") -> str:
    return " ".join([word] * tokens_n)


class TestTokenBudget:
    def test_priority_order_and_cutoff(self, spark):
        # quality: 200-token and 150-token docs saturate at 1.0;
        # 50-token doc scores 0.5 (all words len 4 -> shape part 1.0)
        df = spark.createDataFrame(
            [(1, _doc(200)), (2, _doc(150)), (3, _doc(50))],
            ["doc_id", "text"])
        out = {r["doc_id"]: r for r in
               token_budget_select(df, budget=300).collect()}
        # order: (q=1.0, id=1) run=200; (q=1.0, id=2) run=350 > 300 stops
        assert set(out) == {1}
        assert out[1]["running"] == 200 and out[1]["tok"] == 200

    def test_cross_band_running_totals(self, spark):
        df = spark.createDataFrame(
            [(1, _doc(200)), (2, _doc(150)), (3, _doc(50))],
            ["doc_id", "text"])
        out = {r["doc_id"]: r["running"] for r in
               token_budget_select(df, budget=100_000).collect()}
        # bands differ (q=1.0 -> band 15, q=0.5 -> band 8): the offset
        # join must still produce the exact global prefix sums
        assert out == {1: 200, 2: 350, 3: 400}

    def test_strictly_prefix_not_knapsack(self, spark):
        # a later small doc may FIT the leftover budget but must not be
        # taken once the running total has crossed it (prefix semantics)
        df = spark.createDataFrame(
            [(1, _doc(200)), (2, _doc(150)), (3, _doc(50))],
            ["doc_id", "text"])
        out = token_budget_select(df, budget=210)
        assert [r["doc_id"] for r in out.collect()] == [1]


class TestIncrementalDedup:
    def test_statuses_match_model(self, spark):
        from filodb_spark.operators.text import split_hash
        texts = {i: f"unique text {i}" for i in range(40)}
        # duplicate chains: ids 1,2,3 share text; 4,5 share another
        for i in (2, 3):
            texts[i] = texts[1]
        texts[5] = texts[4]
        df = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], ["doc_id", "text"])
        cut = 5000
        out = {r["doc_id"]: r["status"] for r in
               incremental_dedup(df, existing_buckets=cut).collect()}
        # reference model in Python on the same md5 buckets
        buckets = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id", split_hash(F.col("doc_id")).alias("b")).collect()}
        corpus_texts = {texts[i].strip().lower()
                        for i in texts if buckets[i] < cut}
        batch = sorted(i for i in texts if buckets[i] >= cut)
        expected = {}
        first_seen = {}
        for i in batch:
            t = texts[i].strip().lower()
            if t in corpus_texts:
                expected[i] = "dup_corpus"
            elif t in first_seen:
                expected[i] = "dup_batch"
            else:
                first_seen[t] = i
                expected[i] = "new"
        assert out == expected
        assert set(out) == set(batch)   # corpus side never emitted


class TestLshVerifiedPairs:
    def test_true_jaccard_on_candidates_only(self, spark):
        base = ("the quick brown fox jumps over the lazy dog while the "
                "cat naps by the warm stove in the tiny kitchen")
        rows = [(1, base),
                (2, base + " tonight"),                    # near-dup of 1
                (3, "completely different words about spark plans and "
                    "parquet footers and shuffle partitions everywhere"),
                (4, "yet another unrelated document concerning kmeans "
                    "centroids and jaccard verification thresholds")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {(r["d1"], r["d2"]): r["jaccard"]
               for r in lsh_verified_pairs(df).collect()}
        assert (1, 2) in out
        assert out[(1, 2)] >= 0.5
        # verified jaccard equals the exact all-pairs jaccard over the
        # SAME 5-gram shingle set the signatures estimate
        exact = {(r["d1"], r["d2"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(df, threshold=0.5,
                                              n=5).collect()}
        assert out[(1, 2)] == exact[(1, 2)]

    def test_output_is_subset_of_candidates(self, spark):
        rows = [(i, f"document number {i} with some shared scaffolding "
                    f"words plus unique token u{i}") for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        cand = {(r["d1"], r["d2"]) for r in
                minhash_lsh_pairs_portable(df, threshold=0.2).collect()}
        got = {(r["d1"], r["d2"]) for r in lsh_verified_pairs(
            df, est_threshold=0.2, true_threshold=0.5).collect()}
        assert got <= cand


class TestBigramLogprob:
    def test_model_matches_python(self, spark):
        import math
        from filodb_spark.operators.text import bigram_logprob
        docs = {1: "a b a b", 2: "b a", 3: "c", 4: ""}
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        out = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
               for r in bigram_logprob(df).collect()}
        # python model
        toks = {i: t.split() for i, t in docs.items() if t.strip()}
        bgs = {}
        ctx = {}
        vocab = set()
        for t in toks.values():
            vocab.update(t)
            for a, b in zip(t, t[1:]):
                bgs[(a, b)] = bgs.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        V = len(vocab)
        for i, t in toks.items():
            pairs = list(zip(t, t[1:]))
            if not pairs:
                assert out[i] == (0, None)
                continue
            lp = sum(math.log((bgs[p] + 1) / (ctx[p[0]] + V))
                     for p in pairs) / len(pairs)
            assert out[i][0] == len(pairs)
            assert out[i][1] == pytest.approx(lp, abs=1e-6)
        assert out[4] == (0, None)

    def test_word_salad_scores_below_natural_order(self, spark):
        # corpus dominated by "the cat sat" order; a doc using the same
        # words in a rare order must score lower
        rows = [(i, "the cat sat on the mat") for i in range(10)]
        rows.append((100, "mat the on sat cat the"))
        from filodb_spark.operators.text import bigram_logprob
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["avg_logprob"]
               for r in bigram_logprob(df).collect()}
        assert out[100] < out[0]


class TestFunnel:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "user_id long, ts long, "
                                     "event_type string")

    def test_strict_order_and_depth(self, spark):
        rows = [
            (1, 10, "signup"), (1, 20, "view"), (1, 30, "click"),
            (1, 40, "purchase"),                       # full depth 4
            (2, 10, "signup"), (2, 20, "view"),        # stalls at 2
            (3, 50, "view"), (3, 60, "signup"),        # view BEFORE signup
            (4, 10, "view"), (4, 20, "click"),         # never signed up
        ]
        from filodb_spark.operators.timeseries import funnel
        out = {r["user_id"]: r for r in funnel(
            self._ev(spark, rows),
            ["signup", "view", "click", "purchase"]).collect()}
        assert out[1]["depth"] == 4 and out[1]["t_4"] == 40
        assert out[2]["depth"] == 2 and out[2]["t_3"] is None
        assert out[3]["depth"] == 1        # pre-signup view doesn't count
        assert 4 not in out                # no step-1 event -> no row

    def test_same_timestamp_not_matched(self, spark):
        # strictly-after semantics: a view at the signup instant is not
        # a progression
        rows = [(1, 10, "signup"), (1, 10, "view"), (1, 20, "view")]
        from filodb_spark.operators.timeseries import funnel
        out = funnel(self._ev(spark, rows), ["signup", "view"]).first()
        assert out["t_2"] == 20

    def test_window_cutoff(self, spark):
        rows = [(1, 0, "signup"), (1, 150, "view"),
                (2, 0, "signup"), (2, 50, "view")]
        from filodb_spark.operators.timeseries import funnel
        out = {r["user_id"]: r for r in funnel(
            self._ev(spark, rows), ["signup", "view"],
            window_ms=100).collect()}
        assert out[1]["depth"] == 1        # view outside the 100ms window
        assert out[2]["depth"] == 2

    def test_greedy_earliest_match_is_optimal(self, spark):
        # the earliest view (t=20) is taken even though a later one
        # (t=30) also precedes the click — same final depth, earliest ts
        rows = [(1, 10, "signup"), (1, 20, "view"), (1, 30, "view"),
                (1, 40, "click")]
        from filodb_spark.operators.timeseries import funnel
        out = funnel(self._ev(spark, rows),
                     ["signup", "view", "click"]).first()
        assert out["t_2"] == 20 and out["depth"] == 3

    def test_summary_counts_and_conversion(self, spark):
        rows = [(1, 10, "signup"), (1, 20, "view"),
                (2, 10, "signup"),
                (3, 10, "signup"), (3, 30, "view")]
        from filodb_spark.operators.timeseries import funnel_summary
        out = {r["step"]: r for r in funnel_summary(
            self._ev(spark, rows), ["signup", "view"]).collect()}
        assert out[1]["n_reached"] == 3 and out[1]["conversion"] == 1.0
        assert out[2]["n_reached"] == 2
        assert out[2]["conversion"] == pytest.approx(2 / 3, abs=1e-6)
        assert out[2]["mean_ms_from_start"] == pytest.approx(15.0)

    def test_plan_no_cartesian(self, spark):
        from filodb_spark.operators.timeseries import funnel
        d = self._ev(spark, [(1, 10, "signup"), (1, 20, "view")])
        plan = funnel(d, ["signup", "view", "click"])._jdf \
            .queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan


class TestCohortRetention:
    def test_triangle_matches_model(self, spark):
        # period 100: u1 first at 50 (cohort 0), active periods 0,1,2;
        # u2 first at 150 (cohort 1), active 1,3; u3 cohort 0, only p0
        rows = [(1, 50), (1, 120), (1, 260), (2, 150), (2, 390), (3, 10)]
        df = spark.createDataFrame(rows, "user_id long, ts long")
        from filodb_spark.operators.timeseries import cohort_retention
        out = {(r["cohort_period"], r["period_offset"]):
               (r["n_active"], r["n_cohort"], r["retention"])
               for r in cohort_retention(df, period_ms=100).collect()}
        assert out[(0, 0)] == (2, 2, 1.0)
        assert out[(0, 1)] == (1, 2, 0.5)
        assert out[(0, 2)] == (1, 2, 0.5)
        assert out[(1, 0)] == (1, 1, 1.0)
        assert out[(1, 2)] == (1, 1, 1.0)
        assert (1, 1) not in out           # u2 inactive in offset 1


class TestSessionTransitions:
    def test_matrix_matches_model(self, spark):
        # one user, two sessions (gap > 100): A B A | B C
        rows = [(1, 0, "A", 1), (1, 10, "B", 2), (1, 20, "A", 3),
                (1, 500, "B", 4), (1, 510, "C", 5)]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, event_id long")
        from filodb_spark.operators.timeseries import session_transitions
        out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
               for r in session_transitions(df, ["user_id"], gap_ms=100,
                                            tie_col="event_id").collect()}
        # transitions: A->B, B->A (session 1), B->C (session 2)
        assert out[("A", "B")] == (1, 1.0)
        assert out[("B", "A")] == (1, 0.5)
        assert out[("B", "C")] == (1, 0.5)
        # no cross-session A->B bridge from ts=20 to ts=500
        assert len(out) == 3

    def test_tie_break_deterministic(self, spark):
        # two events at the same ts: event_id orders them
        rows = [(1, 0, "X", 2), (1, 0, "Y", 1), (1, 5, "Z", 3)]
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, event_id long")
        from filodb_spark.operators.timeseries import session_transitions
        out = {(r["from_type"], r["to_type"]) for r in
               session_transitions(df, ["user_id"], gap_ms=100,
                                   tie_col="event_id").collect()}
        assert out == {("Y", "X"), ("X", "Z")}


class TestDatasetDiff:
    def test_all_four_statuses(self, spark):
        from filodb_spark.operators.pipeline import dataset_diff
        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "gets removed"),
             (4, "Same   TEXT")],                 # normalizes to same fp
            ["doc_id", "text"])
        new = spark.createDataFrame(
            [(1, "same text"), (2, "has changed"), (5, "brand new"),
             (4, "same text")],                   # fp-equal to old id 4
            ["doc_id", "text"])
        out = {r["doc_id"]: r["status"]
               for r in dataset_diff(old, new).collect()}
        assert out == {1: "unchanged", 2: "changed", 3: "removed",
                       4: "unchanged", 5: "added"}


class TestRfmSegments:
    def test_scores_against_model(self, spark):
        from filodb_spark.operators.timeseries import rfm_segments
        hour = 3600 * 1000
        t_end = 100 * 24 * hour
        rows = []
        # u1: recent (last at corpus max), 60 events, 2000 purchase value
        for i in range(59):
            rows.append((1, t_end - 30 * 24 * hour + i, "click", 0.0))
        rows.append((1, t_end, "purchase", 2000.0))
        # u2: last 3 days ago, 12 events, 150 monetary
        for i in range(11):
            rows.append((2, t_end - 10 * 24 * hour + i, "click", 0.0))
        rows.append((2, t_end - 3 * 24 * hour, "purchase", 150.0))
        # u3: stale (30d), 2 events, no purchases
        rows.append((3, t_end - 30 * 24 * hour, "view", 5.0))
        rows.append((3, t_end - 29 * 24 * hour, "click", 5.0))
        df = spark.createDataFrame(
            rows, "user_id long, ts long, event_type string, value double")
        out = {r["user_id"]: r for r in rfm_segments(df).collect()}
        assert (out[1]["r"], out[1]["f"], out[1]["m"]) == (3, 3, 3)
        assert out[1]["segment"] == 333
        assert (out[2]["r"], out[2]["f"], out[2]["m"]) == (2, 2, 2)
        assert (out[3]["r"], out[3]["f"], out[3]["m"]) == (1, 1, 1)
        assert out[1]["recency_ms"] == 0
        assert out[2]["frequency"] == 12 and out[2]["monetary"] == 150.0


class TestPqTopk:
    def test_adc_ranks_by_code_distance(self, spark):
        from filodb_spark.operators.similarity import pq_topk
        # codebook = vectors 0,1 (the two lowest ids); corpus members
        # near codebook 0 must rank above members near codebook 1 for a
        # query that quantizes to codebook 0's cells
        pts = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [10.0, 10.0, 10.0, 10.0]),
               (2, [0.4, 0.1, 0.2, 0.3]), (3, [9.6, 9.9, 9.8, 10.2]),
               (4, [0.2, 0.2, 0.1, 0.1])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        q = df.where(F.col("vec_id") == 4)
        out = [(r["nid"], r["adist2"]) for r in
               pq_topk(df, q, k=4, m=2, n_codes=2)
               .orderBy("rank").collect()]
        nids = [n for n, _ in out]
        # 0 and 2 share the query's codes -> identical (minimal) adist;
        # ties break by nid; far-cluster members come last
        assert nids[:2] == [0, 2]
        assert set(nids[2:]) == {1, 3}
        assert out[0][1] == out[1][1]          # same-code ties
        assert out[0][1] < out[2][1]

    def test_adc_is_quantized_candidate_distance(self, spark):
        from filodb_spark.operators.similarity import pq_topk
        # ADC measures ||quantize(candidate) - query||^2 with the EXACT
        # query: a candidate whose codes select the query's own codebook
        # cells scores 0 (its quantization collapsed onto the query),
        # and a far candidate scores the full codebook-to-query L2
        pts = [(0, [0.0, 0.0, 4.0, 4.0]), (1, [8.0, 8.0, -4.0, -4.0]),
               (2, [0.5, 0.5, 4.5, 4.5])]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        q = df.where(F.col("vec_id") == 0)
        adc = {r["nid"]: r["adist2"] for r in
               pq_topk(df, q, k=3, m=2, n_codes=2).collect()}
        assert adc[2] == 0.0
        # quantize(1) = codebook 1 = [8,8,-4,-4]; q = [0,0,4,4]
        assert adc[1] == pytest.approx(4 * 64.0, abs=1e-6)


class TestRollingFeatures:
    def test_trailing_window_model(self, spark):
        from filodb_spark.operators.timeseries import rolling_features
        rows = [(1, 0, 1.0), (1, 500, 2.0), (1, 1000, 4.0),
                (1, 1600, 8.0), (2, 0, 10.0)]
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = {(r["user_id"], r["ts"]): (r["w_count"], r["w_sum"])
               for r in rolling_features(df, ["user_id"], 1000).collect()}
        assert out[(1, 0)] == (1, 1.0)
        assert out[(1, 500)] == (2, 3.0)
        assert out[(1, 1000)] == (3, 7.0)       # 0 is INSIDE [-1000, 0]
        assert out[(1, 1600)] == (2, 12.0)      # 500 dropped, 1000 kept
        assert out[(2, 0)] == (1, 10.0)

    def test_single_exchange_range_frame(self, spark):
        from filodb_spark.operators.timeseries import rolling_features
        df = spark.createDataFrame([(1, 0, 1.0)],
                                   "user_id long, ts long, value double")
        out = rolling_features(df, ["user_id"], 1000)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1 and "Join" not in plan
        # the physical plan string elides frame specs; the analyzed
        # plan names the frame type
        analyzed = out._jdf.queryExecution().analyzed().toString()
        assert "RangeFrame" in analyzed


class TestRollingAnomalies:
    def test_prior_window_self_excluding(self, spark):
        from filodb_spark.operators.timeseries import rolling_anomalies
        # 6 steady points then a spike: the spike's PRIOR window stats
        # exclude the spike itself, so it flags; the spike must not
        # pollute its own baseline
        rows = [(1, t * 10, 5.0 + (0.1 if t % 2 else -0.1))
                for t in range(6)]
        rows.append((1, 60, 50.0))
        df = spark.createDataFrame(rows, "user_id long, ts long, value double")
        out = {r["ts"]: r for r in
               rolling_anomalies(df, ["user_id"], 1000,
                                 z_threshold=3.0).collect()}
        assert out[60]["is_anomaly"]
        assert out[60]["w_mean"] == 5.0        # spike excluded from stats
        # cold start: first 5 events have < 5 prior points -> unscored
        for t in range(5):
            assert out[t * 10]["z"] is None
            assert not out[t * 10]["is_anomaly"]
