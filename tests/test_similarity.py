"""Similarity-search operator tests: exact brute-force goldens on a
hand-built corpus, IVF subset/recall properties on the fixture
embeddings, and kernel math vs numpy."""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    # unit-ish vectors with known cosine structure: v1~v2 aligned,
    # v3 orthogonal, v4 opposite to v1
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestBruteForce:
    def test_known_neighbors(self, tiny):
        out = sim.brute_force_topk(tiny, tiny.where(F.col("vec_id") == 1), k=3)
        got = [(r["nid"], r["rank"]) for r in out.orderBy("rank").collect()]
        # nearest: 2 (aligned), then 3 (orthogonal, sim 0), then 4 (opposite)
        assert got == [(2, 1), (3, 2), (4, 3)]

    def test_sim_values_match_numpy(self, tiny):
        import numpy as np
        out = {r["nid"]: r["sim"] for r in sim.brute_force_topk(
            tiny, tiny.where(F.col("vec_id") == 1), k=3).collect()}
        vecs = {1: [1.0, 0.0, 0.0], 2: [0.9, 0.1, 0.0],
                3: [0.0, 1.0, 0.0], 4: [-1.0, 0.0, 0.0]}
        for nid, s in out.items():
            a, b = np.array(vecs[1]), np.array(vecs[nid])
            expect = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert s == pytest.approx(expect, abs=1e-6)

    def test_self_excluded_and_k_bound(self, tiny):
        out = sim.brute_force_topk(tiny, tiny, k=2).collect()
        assert all(r["nid"] != r["qid"] for r in out)
        per_q = {}
        for r in out:
            per_q.setdefault(r["qid"], []).append(r["rank"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
                   for v in per_q.values())


@pytest.mark.slow
class TestIVF:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_subset_of_bucket_bruteforce(self, emb):
        """Every IVF result pair must be a corpus pair sharing the
        query's bucket, with the same similarity brute force computes."""
        q = emb.where(F.col("vec_id") < 10)
        ivf = sim.ivf_topk(emb, q, k=3)
        bf = sim.brute_force_topk(emb, q, k=10_000_000)
        j = (ivf.select("qid", "nid", F.col("sim").alias("ivf_sim"))
             .join(bf.select("qid", "nid", F.col("sim").alias("bf_sim")),
                   ["qid", "nid"], "left"))
        rows = j.collect()
        assert rows and all(r["bf_sim"] is not None
                            and r["ivf_sim"] == r["bf_sim"] for r in rows)

    def test_recall_scales_with_probes(self, emb):
        """Multi-probe LSH: recall@3 vs exact top-3 must rise with
        n_probes and beat the random-bucket baseline (p/64). Measured on
        this fixture: 0.067 / 0.187 / 0.300 at 1/4/7 probes — the test
        asserts conservative floors (deterministic hashes, so stable)."""
        q = emb.where(F.col("vec_id") < 50)
        exact = {(r["qid"], r["nid"])
                 for r in sim.brute_force_topk(emb, q, k=3).collect()}

        def recall(p):
            approx = {(r["qid"], r["nid"])
                      for r in sim.ivf_topk(emb, q, k=3, n_probes=p).collect()}
            return len(exact & approx) / len(exact)

        r1, r4, r7 = recall(1), recall(4), recall(7)
        assert r1 <= r4 <= r7
        assert r4 >= 0.12 and r7 >= 0.25    # > random baseline p/64
        # sub-linear probe: bucketed candidate pairs << full cross join
        n = emb.count()
        cand = (sim.ivf_assign(emb).groupBy("bucket").count()
                .agg(F.sum(F.col("count") * F.col("count"))).first()[0])
        assert cand < n * n / 4

    def test_kmeans_ivf_beats_sign_hash(self, emb):
        """Trained centroids (spherical k-means) must beat the sign-hash
        buckets at equal probe count. Measured: 0.25/0.44 recall@3 at
        1/4 probes (vs 0.07/0.19 for sign-hash)."""
        q = emb.where(F.col("vec_id") < 50)
        exact = {(r["qid"], r["nid"])
                 for r in sim.brute_force_topk(emb, q, k=3).collect()}
        cents = sim.ivf_fit_centroids(emb)
        for probes, floor in [(1, 0.15), (4, 0.35)]:
            approx = {(r["qid"], r["nid"]) for r in sim.ivf_kmeans_topk(
                emb, q, k=3, n_probes=probes, centroids=cents).collect()}
            assert len(exact & approx) / len(exact) >= floor


class TestKernels:
    def test_dot_deterministic_order(self, spark):
        df = spark.createDataFrame(
            [([1e16, 1.0, -1e16],)], "v array<double>")
        # sequential fold: (1e16 + 1.0) - 1e16 = 0.0 exactly in this
        # order (1.0 is absorbed) — proves left-to-right determinism
        ones = F.array(*[F.lit(1.0)] * 3)
        got = df.select(sim.dot(F.col("v"), ones).alias("d")).first()["d"]
        assert got == 0.0

    def test_cosine_range(self, spark):
        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0], [-3.0, 2.0, -1.0])], "a array<double>, b array<double>")
        c = df.select(sim.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
        assert -1.0 <= c <= 1.0
        assert c == pytest.approx((-3 + 4 - 3) / (math.sqrt(14) * math.sqrt(14)))


class TestPortableIVF:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_bucket_is_hashfree_bijection(self, emb):
        # 6 sign bits -> bucket ids are exactly the 0..63 integer range
        buckets = (emb.select(sim.sign_bucket("embedding").alias("b"))
                   .distinct().collect())
        vals = {r["b"] for r in buckets}
        assert vals <= set(range(64)) and len(vals) > 1

    def test_portable_recall_above_random(self, emb):
        q = emb.where(F.col("vec_id") < 50)
        exact = {(r["qid"], r["nid"])
                 for r in sim.brute_force_topk(emb, q, k=3).collect()}
        approx = {(r["qid"], r["nid"])
                  for r in sim.ivf_topk_portable(emb, q, k=3,
                                                 n_probes=4).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.10            # ~2x the random baseline 4/64
        # sims of returned pairs match brute force exactly
        bf = {(r["qid"], r["nid"]): r["sim"]
              for r in sim.brute_force_topk(emb, q, k=10_000_000).collect()}
        for r in sim.ivf_topk_portable(emb, q, k=3, n_probes=4).collect():
            assert bf[(r["qid"], r["nid"])] == r["sim"]

    def test_portable_rejects_probes_beyond_bucket_bits(self, emb):
        # probe index p flips bit p-1; p-1 >= _SIGN_BITS addresses buckets
        # outside the bucket space (unoccupiable -> silent recall loss)
        import pytest
        q = emb.where(F.col("vec_id") < 5)
        with pytest.raises(ValueError, match="n_probes"):
            sim.ivf_topk_portable(emb, q, k=3, n_probes=sim._SIGN_BITS + 2)
        # boundary value is legal
        sim.ivf_topk_portable(emb, q, k=3, n_probes=sim._SIGN_BITS + 1)


@pytest.mark.slow
class TestIvfPq:
    """The composed IVF x PQ index: candidate selection by sign-bucket
    probes, scoring by ADC over PQ codes."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_candidates_restricted_to_probed_buckets(self, emb):
        """At n_probes=1 every neighbor must share the query's own
        sign bucket — the coarse layer actually gates candidates."""
        q = emb.where(F.col("vec_id") < 10)
        out = sim.ivfpq_topk(emb, q, k=3, n_probes=1).collect()
        buckets = {r["vec_id"]: r["b"] for r in
                   emb.select("vec_id",
                              sim.sign_bucket("embedding").alias("b"))
                   .collect()}
        assert out, "probe-1 search returned nothing"
        for r in out:
            assert buckets[r["nid"]] == buckets[r["qid"]]

    def test_equals_pq_when_one_bucket_covers_all(self, spark):
        """A corpus whose vectors all share one sign bucket makes the
        IVF layer a no-op: ivfpq must equal plain pq_topk exactly
        (same codes, same ADC distances, same ranks)."""
        pts = [(i, [1.0 + 0.1 * i * j for j in range(4)])
               for i in range(8)]        # all components > 0 -> bucket 63
        df = spark.createDataFrame(pts,
                                   "vec_id long, embedding array<double>")
        q = df.where(F.col("vec_id") < 3)
        full = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                sim.pq_topk(df, q, k=3, m=2, n_codes=2).collect()}
        comp = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                sim.ivfpq_topk(df, q, k=3, m=2, n_codes=2,
                               n_probes=1).collect()}
        assert comp == full

    def test_recall_not_below_probe1_at_more_probes(self, emb):
        q = emb.where(F.col("vec_id") < 10)
        exact = sim.brute_force_topk_l2(emb, q, k=3)
        r1 = sim.topk_recall(sim.ivfpq_topk(emb, q, k=3, n_probes=1),
                             exact).agg(F.avg("recall")).first()[0]
        r7 = sim.topk_recall(sim.ivfpq_topk(emb, q, k=3, n_probes=7),
                             exact).agg(F.avg("recall")).first()[0]
        assert r7 >= r1

    def test_probe_cap_raises(self, emb):
        with pytest.raises(ValueError, match="n_probes"):
            sim.ivfpq_topk(emb, emb.limit(1), k=3, n_probes=8)

    def test_prebuilt_index_roundtrip(self, emb, tmp_path):
        """The stored-index path: ivfpq_index written to parquet
        (partitioned by bucket), read back, searched via index= —
        results must equal the direct (re-encoding) search exactly."""
        q = emb.where(F.col("vec_id") < 10)
        path = str(tmp_path / "ivfpq_idx")
        (sim.ivfpq_index(emb).write.mode("overwrite")
            .partitionBy("_bucket").parquet(path))
        idx = emb.sparkSession.read.parquet(path)
        direct = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                  sim.ivfpq_topk(emb, q, k=3).collect()}
        stored = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                  sim.ivfpq_topk(emb, q, k=3, index=idx).collect()}
        assert stored == direct


class TestSemanticDedup:
    def test_lower_id_wins_within_bucket(self, spark):
        from filodb_spark.operators.similarity import semantic_dedup
        df = spark.createDataFrame(
            [(1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
             (2, [2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),    # cos=1 with 1
             (3, [-1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),   # other bucket
             (4, [1.0, 2.0, 1.0, 1.0, 1.0, 1.0])],   # cos~0.95 with 1
            ["vec_id", "embedding"])
        out = {r.vec_id: (r.keep, r.dup_of)
               for r in semantic_dedup(df, threshold=0.9).collect()}
        assert out[1] == (True, None)
        assert out[2] == (False, 1)
        assert out[3] == (True, None)    # bucket boundary blocks the pair
        assert out[4] == (False, 1)

    def test_threshold_excludes_far_pairs(self, spark):
        from filodb_spark.operators.similarity import semantic_dedup
        df = spark.createDataFrame(
            [(1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
             (2, [5.0, 1.0, 0.1, 0.1, 0.1, 0.1])],   # same bucket, low cos
            ["vec_id", "embedding"])
        out = {r.vec_id: r.keep
               for r in semantic_dedup(df, threshold=0.99).collect()}
        assert out == {1: True, 2: True}


class TestEmbeddingOutliers:
    def test_far_vector_flagged(self, spark):
        from filodb_spark.operators.similarity import embedding_outliers
        base = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
        rows = [(i, [v + 0.01 * i for v in base]) for i in range(8)]
        rows.append((99, [50.0, 1.0, 1.0, 1.0, 1.0, 1.0]))  # same bucket, far
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {r.vec_id: r for r in embedding_outliers(df).collect()}
        assert out[99].is_outlier
        assert all(not out[i].is_outlier for i in range(8))
        # all in the all-positive sign bucket
        assert len({r.bucket for r in out.values()}) == 1

    def test_singleton_bucket_null_z(self, spark):
        from filodb_spark.operators.similarity import embedding_outliers
        df = spark.createDataFrame(
            [(1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
             (2, [-1.0, 1.0, 1.0, 1.0, 1.0, 1.0])],
            ["vec_id", "embedding"])
        out = {r.vec_id: r for r in embedding_outliers(df).collect()}
        for r in out.values():
            assert r.z is None and not r.is_outlier
            assert r.dist == 0.0   # centroid of a singleton is itself


class TestTopkRecall:
    def test_counts_overlap_per_query(self, spark):
        from filodb_spark.operators.similarity import topk_recall
        exact = spark.createDataFrame(
            [(1, 10, 1, 0.9), (1, 11, 2, 0.8), (1, 12, 3, 0.7),
             (2, 20, 1, 0.9), (2, 21, 2, 0.8)],
            ["qid", "nid", "rank", "sim"])
        approx = spark.createDataFrame(
            [(1, 10, 1, 0.9), (1, 99, 2, 0.5), (1, 12, 3, 0.7),
             (2, 98, 1, 0.4)],
            ["qid", "nid", "rank", "sim"])
        out = {r.qid: r for r in topk_recall(approx, exact).collect()}
        assert (out[1].n_true, out[1].n_hit, out[1].recall) == (3, 2, round(2/3, 6))
        assert (out[2].n_true, out[2].n_hit, out[2].recall) == (2, 0, 0.0)


@pytest.mark.slow
class TestPrebuiltIndexValidation:
    """ADVICE r4: prebuilt-code entry points must reject indexes that
    disagree with the search parameters instead of silently producing
    null/wrong ADC distances."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    def test_mismatched_m_raises(self, emb):
        q = emb.where(F.col("vec_id") < 3)
        idx = sim.ivfpq_index(emb, m=4, n_codes=4)
        with pytest.raises(ValueError, match="subspaces"):
            sim.ivfpq_topk(emb, q, k=3, m=2, n_codes=4, index=idx)

    def test_out_of_range_codes_raise(self, emb):
        q = emb.where(F.col("vec_id") < 3)
        enc = sim.pq_encode(emb, m=4, k=4)
        with pytest.raises(ValueError, match="n_codes=2"):
            sim.pq_topk(emb, q, k=3, m=4, n_codes=2, encoded=enc)

    def test_missing_bucket_raises(self, emb):
        q = emb.where(F.col("vec_id") < 3)
        enc = sim.pq_encode(emb, m=4, k=4)   # no _bucket carry
        with pytest.raises(ValueError, match="_bucket"):
            sim.ivfpq_topk(emb, q, k=3, m=4, n_codes=4, index=enc)

    def test_missing_codes_column_raises(self, emb):
        q = emb.where(F.col("vec_id") < 3)
        with pytest.raises(ValueError, match="codes"):
            sim.pq_topk(emb, q, k=3, encoded=emb.select("vec_id"))

    def test_index_build_rejects_bucket_collision(self, emb):
        with pytest.raises(ValueError, match="_bucket"):
            sim.ivfpq_index(emb.withColumn("_bucket", F.lit(0)))

    def test_encode_rejects_carry_collision(self, emb):
        for bad in ("codes", "err2", "_c0"):
            with pytest.raises(ValueError, match="collides"):
                sim.pq_encode(emb.withColumn(bad, F.lit(1)),
                              carry=(bad,))

    def test_validate_false_skips_check_same_results(self, emb):
        """ADVICE r5: validate=False must skip the per-search full
        index aggregation without changing results (the once-per-index
        validation path)."""
        q = emb.where(F.col("vec_id") < 3)
        idx = sim.ivfpq_index(emb, m=4, n_codes=4)
        a = sorted(tuple(r) for r in
                   sim.ivfpq_topk(emb, q, k=3, m=4, n_codes=4,
                                  index=idx).collect())
        b = sorted(tuple(r) for r in
                   sim.ivfpq_topk(emb, q, k=3, m=4, n_codes=4,
                                  index=idx, validate=False).collect())
        assert a == b and len(a) > 0
        # validate=False really skips: a mismatched-m search now fails
        # downstream or returns wrong results, but must NOT raise the
        # validation error eagerly
        sim.ivfpq_topk(emb, q, k=3, m=2, n_codes=4, index=idx,
                       validate=False)   # builds without the eager check

    def test_wrong_dim_centroids_raise(self, emb):
        """ADVICE r5: caller-supplied centroids of the wrong width must
        raise, not null-pad into arbitrary bucket assignment."""
        cents = sim.kmeans_fit_portable(emb, k=4, iterations=1)
        short = [(j, c[:-1]) for j, c in cents]
        q = emb.where(F.col("vec_id") < 3)
        with pytest.raises(ValueError, match="dim"):
            sim.ivfpq_kmeans_topk(emb, q, k=3, centroids=short)
        ragged = [(j, c[:-1] if j == 0 else c) for j, c in cents]
        with pytest.raises(ValueError, match="inconsistent"):
            sim.kmeans_bucket_col(ragged, "embedding")

    def test_write_index_rejects_non_bare_table_name(self, emb):
        idx = sim.ivfpq_index(emb.limit(4), m=4, n_codes=4)
        for bad in ("db.tbl", "t-x", "t x", "`t`", "a;drop", ""):
            with pytest.raises(ValueError, match="bare identifier"):
                sim.ivfpq_write_index(idx, bad)


@pytest.mark.slow
class TestIvfPqKmeans:
    """IVF x PQ over trained (portable k-means) coarse buckets."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet")

    @pytest.fixture(scope="class")
    def cents(self, emb):
        return sim.kmeans_fit_portable(emb, k=16, iterations=2)

    def test_candidates_share_probed_cluster(self, emb, cents):
        """At n_probes=1 every returned neighbor must live in the
        query's own nearest cluster — the coarse layer gates."""
        q = emb.where(F.col("vec_id") < 10)
        out = sim.ivfpq_kmeans_topk(emb, q, k=100, n_buckets=16,
                                    n_probes=1, centroids=cents)
        asg = emb.select(
            F.col("vec_id"),
            sim.kmeans_bucket_col(cents, "embedding").alias("c"))
        cmap = {r["vec_id"]: r["c"] for r in asg.collect()}
        rows = out.collect()
        assert rows
        for r in rows:
            assert cmap[r["nid"]] == cmap[r["qid"]]

    def test_beats_sign_hash_at_equal_fraction(self, emb, cents):
        """The whole point: trained buckets must beat sign-hash at the
        same candidate budget (1/16 == 4/64). Measured 0.167 vs 0.033
        on this fixture — floors are conservative."""
        q = emb.where(F.col("vec_id") < 10)
        exact = sim.brute_force_topk_l2(emb, q, k=3)
        km = sim.topk_recall(
            sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                  n_probes=1, centroids=cents),
            exact).agg(F.avg("recall")).first()[0]
        sh = sim.topk_recall(
            sim.ivfpq_topk(emb, q, k=3, n_probes=4),
            exact).agg(F.avg("recall")).first()[0]
        assert km > sh
        assert km >= 0.10

    def test_centroid_reuse_matches_refit(self, emb, cents):
        q = emb.where(F.col("vec_id") < 5)
        a = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
             sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                   centroids=cents).collect()}
        b = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
             sim.ivfpq_kmeans_topk(emb, q, k=3,
                                   n_buckets=16).collect()}
        assert a == b

    def test_probe_bounds(self, emb, cents):
        q = emb.limit(1)
        with pytest.raises(ValueError, match="n_probes"):
            sim.ivfpq_kmeans_topk(emb, q, k=3, n_probes=0,
                                  centroids=cents)
        with pytest.raises(ValueError, match="n_probes"):
            sim.ivfpq_kmeans_topk(emb, q, k=3, centroids=cents,
                                  n_probes=len(cents) + 1)

    def test_bucket_collision_raises(self, emb, cents):
        with pytest.raises(ValueError, match="_bucket"):
            sim.ivfpq_kmeans_topk(emb.withColumn("_bucket", F.lit(0)),
                                  emb.limit(1), k=3, centroids=cents)

    def test_all_probes_equals_full_adc(self, emb, cents):
        """Probing every trained cluster makes the coarse layer a
        no-op: results must equal pq_topk's full ADC scan exactly
        (same codes, distances, ranks)."""
        q = emb.where(F.col("vec_id") < 5)
        full = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                sim.pq_topk(emb, q, k=3, m=4, n_codes=4).collect()}
        comp = {(r["qid"], r["nid"]): (r["rank"], r["adist2"]) for r in
                sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                      n_probes=len(cents),
                                      centroids=cents).collect()}
        assert comp == full

    def test_prebuilt_index_equals_direct_search(self, emb, cents):
        """ivfpq_kmeans_index + ivfpq_kmeans_topk(index=) must equal
        the re-encoding search exactly (the write-once/search-forever
        path for trained buckets)."""
        q = emb.where(F.col("vec_id") < 5)
        direct = sorted(tuple(r) for r in
                        sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                              n_probes=2,
                                              centroids=cents).collect())
        idx = sim.ivfpq_kmeans_index(emb, cents, m=4, n_codes=4)
        stored = sorted(tuple(r) for r in
                        sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                              n_probes=2, centroids=cents,
                                              index=idx).collect())
        assert direct == stored and len(direct) > 0
        # validation still guards the prebuilt path
        with pytest.raises(ValueError, match="subspaces"):
            sim.ivfpq_kmeans_topk(emb, q, k=3, m=2, centroids=cents,
                                  index=idx)

    def test_rerank_exact_matches_bruteforce_on_candidates(self, emb,
                                                           cents):
        """rerank_exact over the FULL corpus as candidates must equal
        brute_force_topk_l2 exactly (same folds, same tie-break); with
        rerank_k wide enough to cover every probed candidate, the
        composed ivfpq_kmeans_topk(rerank_k=) equals the exact top-k
        restricted to probed buckets."""
        q = emb.where(F.col("vec_id") < 5)
        all_pairs = (emb.select(F.col("vec_id").alias("nid"))
                     .crossJoin(q.select(F.col("vec_id").alias("qid"))))
        got = sorted(tuple(r) for r in
                     sim.rerank_exact(emb, q, all_pairs, k=3).collect())
        exact = sorted(tuple(r) for r in
                       sim.brute_force_topk_l2(emb, q, k=3).collect())
        assert got == exact and len(got) > 0
        # all buckets probed + wide rerank => exact top-k end to end
        n = emb.count()
        composed = sorted(tuple(r) for r in
                          sim.ivfpq_kmeans_topk(
                              emb, q, k=3, n_buckets=16,
                              n_probes=len(cents), centroids=cents,
                              rerank_k=n).collect())
        assert composed == exact
        with pytest.raises(ValueError, match="rerank_k"):
            sim.ivfpq_kmeans_topk(emb, q, k=5, centroids=cents,
                                  rerank_k=3)

    def test_stored_vector_table_rerank(self, emb, cents, spark):
        """write_vector_table/read_vector_table: the refine stage over
        a candidate-id-filtered bucketed table equals the full-corpus
        rerank exactly, and the id IN-filter bucket-prunes at planning
        time (SelectedBucketsCount)."""
        q = emb.where(F.col("vec_id") < 3)
        cand = sim.ivfpq_kmeans_topk(emb, q, k=12, n_buckets=16,
                                     n_probes=2, centroids=cents)
        full = sorted(tuple(r) for r in
                      sim.rerank_exact(emb, q, cand, k=3).collect())
        sim.write_vector_table(emb, "verify_vecs_r6", n_buckets=64)
        try:
            ids = [r["nid"] for r in cand.select("nid").distinct()
                   .collect()]
            pruned = sim.read_vector_table(spark, "verify_vecs_r6",
                                           ids=ids)
            stored = sorted(tuple(r) for r in
                            sim.rerank_exact(pruned, q, cand,
                                             k=3).collect())
            assert stored == full and len(stored) > 0
            plan = pruned._jdf.queryExecution().executedPlan().toString()
            import re as _re
            m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)",
                           plan)
            assert m, "bucket pruning not in plan"
            assert int(m.group(1)) < int(m.group(2))
            # empty candidate list must yield an empty frame, not a scan
            assert sim.read_vector_table(spark, "verify_vecs_r6",
                                         ids=[]).count() == 0
        finally:
            spark.sql("DROP TABLE IF EXISTS verify_vecs_r6")

    def test_rerank_corpus_param(self, emb, cents, spark):
        """ivfpq_kmeans_topk(rerank_k=, rerank_corpus=): the refine
        fetch uses the supplied vector source instead of the raw
        corpus frame (ADVICE r6 — lets the stored-index path feed the
        bucketed vector table), result identical to the default."""
        q = emb.where(F.col("vec_id") < 3)
        base = sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                     n_probes=2, centroids=cents,
                                     rerank_k=12)
        sim.write_vector_table(emb, "verify_vecs_r7", n_buckets=64)
        try:
            stored = sim.ivfpq_kmeans_topk(
                emb, q, k=3, n_buckets=16, n_probes=2, centroids=cents,
                rerank_k=12,
                rerank_corpus=sim.read_vector_table(spark,
                                                    "verify_vecs_r7"))
            a = sorted(tuple(r) for r in base.collect())
            b = sorted(tuple(r) for r in stored.collect())
            assert a == b and len(a) > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS verify_vecs_r7")

    def test_lut_table_mode_bit_equal(self, emb, cents):
        """lut='table' (broadcast codebook join) must be bit-identical
        to the literal-expression LUT across all three ADC entry points
        — same slice, same zero-seeded left folds, same Python-float
        cnorm (the production-codebook scale path, PERF.md r6)."""
        q = emb.where(F.col("vec_id") < 5)

        def rows(df):
            return sorted(tuple(r) for r in df.collect())

        a = rows(sim.pq_topk(emb, q, k=3, m=4, n_codes=4))
        b = rows(sim.pq_topk(emb, q, k=3, m=4, n_codes=4, lut="table"))
        assert a == b and len(a) > 0
        a = rows(sim.ivfpq_topk(emb, q, k=3, n_probes=3))
        b = rows(sim.ivfpq_topk(emb, q, k=3, n_probes=3, lut="table"))
        assert a == b
        a = rows(sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                       n_probes=2, centroids=cents))
        b = rows(sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                       n_probes=2, centroids=cents,
                                       lut="table"))
        assert a == b
        with pytest.raises(ValueError, match="lut"):
            sim.pq_topk(emb, q, k=3, lut="nope")

    def test_fit_matches_kmeans_portable_assignment(self, emb):
        """kmeans_fit_portable + _kmeans_assign must equal the original
        kmeans_portable end-to-end (the refactor is behavior-neutral)."""
        full = {(r["vec_id"], r["cluster"]) for r in
                sim.kmeans_portable(emb, k=4, iterations=2).collect()}
        cents4 = sim.kmeans_fit_portable(emb, k=4, iterations=2)
        asg = emb.select(
            F.col("vec_id"),
            sim.kmeans_bucket_col(cents4, "embedding").alias("cluster"))
        refit = {(r["vec_id"], r["cluster"]) for r in asg.collect()}
        assert full == refit
