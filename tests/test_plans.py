"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plans Catalyst produces.

- selector predicates push into the parquet scan (PushedFilters)
- partition pruning on shard-key/date directory columns (PartitionFilters)
- the windowing core never emits a nested-loop join
- dimension joins broadcast
"""

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.kernels.range_fns import range_function
from filodb_spark.sources.table import read_series_table, write_series_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def series_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tbl") / "gauge")
    rows = []
    for ns in ["App-0", "App-1"]:
        for i in range(50):
            rows.append(({"__name__": "m", "_ws_": "demo", "_ns_": ns,
                          "inst": str(i % 5)},
                         1_700_000_000_000 + i * 60_000, float(i)))
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    write_series_table(df, path)
    return path


class TestPushdownAndPruning:
    def test_partition_pruning_on_shard_labels(self, spark, series_table):
        df = spark.read.parquet(series_table).where(
            (F.col("_ns_") == "App-0") & (F.col("date") == "2023-11-14"))
        plan = plan_of(df)
        assert "PartitionFilters" in plan
        # partition filters must not appear as data filters
        assert df.count() > 0

    def test_ts_filter_pushed_to_scan(self, spark, series_table):
        df = read_series_table(spark, series_table).where(
            F.col("ts") >= 1_700_000_600_000)
        plan = plan_of(df)
        assert "PushedFilters: [" in plan
        assert "GreaterThanOrEqual(ts" in plan

    def test_metric_filter_pushed(self, spark, series_table):
        df = spark.read.parquet(series_table).where(F.col("_metric") == "m")
        plan = plan_of(df)
        assert "EqualTo(_metric,m)" in plan or "IsNotNull(_metric)" in plan


class TestJoinShapes:
    def test_grid_explode_has_no_join(self, spark):
        df = spark.createDataFrame(
            [("a", i * 1000, float(i)) for i in range(100)],
            "series string, ts long, value double")
        out = range_function(df, "sum_over_time", ["series"],
                             StepGrid(10_000, 90_000, 10_000), 30_000)
        plan = plan_of(out)
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "Join" not in plan  # pure explode + hash aggregate

    def test_rate_single_window_shuffle(self, spark):
        df = spark.createDataFrame(
            [("a", i * 1000, float(i)) for i in range(100)],
            "series string, ts long, value double")
        out = range_function(df, "rate", ["series"],
                             StepGrid(10_000, 90_000, 10_000), 30_000)
        plan = plan_of(out)
        assert "NestedLoop" not in plan
        # lag window + final agg: bounded number of exchanges
        assert plan.count("Exchange") <= 2

    def test_tpch_dim_join_broadcasts(self, spark):
        from filodb_spark.driver_queries.tpch import q_tpch_q5
        plan = plan_of(q_tpch_q5(spark, "/root/testdata/sf0.001"))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_tpch_q7_nation_pair_broadcasts(self, spark):
        # 5-way join: all dims broadcast, no sort-merge on the fact side
        from filodb_spark.driver_queries.tpch import q_tpch_q7
        plan = plan_of(q_tpch_q7(spark, "/root/testdata/sf0.001"))
        assert plan.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in plan

    def test_ivf_join_is_bucket_equi_join(self, spark):
        # IVF candidate generation must be an equi-join on bucket with
        # the (small) query side broadcast — never a cartesian product
        from filodb_spark.operators import similarity as sim
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 10)
        plan = plan_of(sim.ivf_topk(emb, q, k=3))
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_tpch_q21_semi_anti_joins(self, spark):
        # EXISTS/NOT EXISTS compile to hash semi/anti joins on the order
        # key — never a nested-loop over the fact table
        from filodb_spark.driver_queries.tpch import q_tpch_q21
        plan = plan_of(q_tpch_q21(spark, "/root/testdata/sf0.001"))
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_tpch_q2_min_cost_join_broadcasts_dims(self, spark):
        from filodb_spark.driver_queries.tpch import q_tpch_q2
        plan = plan_of(q_tpch_q2(spark, "/root/testdata/sf0.001"))
        assert plan.count("BroadcastHashJoin") >= 3
        assert "CartesianProduct" not in plan

    def test_tpch_scalar_subquery_broadcasts(self, spark):
        # q11/q15/q22 join a 1-row scalar threshold: must be a broadcast
        # (BroadcastNestedLoopJoin over one row is fine; a shuffled
        # cartesian product is not)
        from filodb_spark.driver_queries.tpch import (q_tpch_q11,
                                                      q_tpch_q15,
                                                      q_tpch_q22)
        for q in (q_tpch_q11, q_tpch_q15, q_tpch_q22):
            plan = plan_of(q(spark, "/root/testdata/sf0.001"))
            assert "CartesianProduct" not in plan, q.__name__

    def test_minhash_band_join_no_cartesian(self, spark):
        from filodb_spark.operators import dedup
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(300)
        plan = plan_of(dedup.minhash_lsh_pairs(docs, threshold=0.5))
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan


class TestSeriesTableRoundtrip:
    def test_chunkmeta_function(self, spark, series_table):
        # _filodb_chunkmeta_all (FiloFunctionId / SelectChunkInfosExec):
        # row-group stats of the file-backed store through the engine
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        eng = PromQLEngine(spark, TsStore.from_table(spark, series_table))
        rows = eng.query_range("_filodb_chunkmeta_all(m)",
                               1_700_000_000_000, 1_700_000_000_000, 1).collect()
        assert rows and all(r["num_rows"] > 0 and r["ts_min"] is not None
                            for r in rows)

    def test_roundtrip_values(self, spark, series_table):
        df = read_series_table(spark, series_table)
        assert df.count() == 100
        sub = df.where((F.col("_ns_") == "App-1")
                       & (F.col("labels")["inst"] == "3"))
        assert sub.count() == 10


class TestBucketedStorage:
    """write_series_table_bucketed: metric-equality queries must prune to
    a single bucket at planning time (the storage-level analog of the
    reference's part-key index lookup) — SelectedBucketsCount in the scan
    proves files outside the owning bucket are never opened."""

    N_BUCKETS = 8

    @pytest.fixture(scope="class")
    def bucketed_table(self, spark):
        rows = []
        for m in [f"metric_{i}" for i in range(10)]:
            for i in range(20):
                rows.append(({"__name__": m, "_ws_": "demo", "_ns_": "App-0",
                              "inst": str(i % 3)},
                             1_700_000_000_000 + i * 60_000, float(i)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        from filodb_spark.sources.table import write_series_table_bucketed
        name = "t_bucketed_plan_test"
        write_series_table_bucketed(df, name, n_buckets=self.N_BUCKETS)
        yield name
        spark.sql(f"DROP TABLE IF EXISTS {name}")

    def test_single_metric_prunes_buckets(self, spark, bucketed_table):
        df = spark.table(bucketed_table).where(F.col("_metric") == "metric_3")
        plan = plan_of(df)
        assert f"SelectedBucketsCount: 1 out of {self.N_BUCKETS}" in plan
        assert df.count() == 20

    def test_no_filter_reads_all_buckets(self, spark, bucketed_table):
        plan = plan_of(spark.table(bucketed_table))
        assert "SelectedBucketsCount: 1 out of" not in plan

    def test_file_split_plain_table(self, spark, tmp_path):
        # files_per_partition bounds per-file size: each (ws,ns,date) dir
        # gets several series-hash-split files instead of one giant file
        rows = [({"__name__": "m", "_ws_": "w", "_ns_": "n",
                  "inst": str(i)}, 1_700_000_000_000 + (i % 7) * 60_000,
                 float(i)) for i in range(200)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        p = str(tmp_path / "split")
        # AQE coalescing rightly re-merges tiny partitions at fixture
        # scale (at real scale it sizes them to the advisory partition
        # bytes); disable it to observe the salt split itself
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "false")
        try:
            write_series_table(df, p, files_per_partition=4)
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                           "true")
        import glob
        files = glob.glob(f"{p}/_ws_=w/_ns_=n/date=*/*.parquet")
        # salts hash into shuffle partitions, so collisions can merge
        # some; the contract is that the directory is split at all
        assert 2 <= len(files) <= 4
        got = spark.read.parquet(p)
        assert got.count() == 200


class TestNewOpPlanShapes:
    def test_asof_join_is_single_shuffle_no_join(self, spark):
        """asof_join must compile to ONE exchange + ONE sort and no join
        operator (the union+carry window shape) — at scale this is the
        whole point vs a range join."""
        from filodb_spark.operators.timeseries import asof_join
        l = spark.createDataFrame([("a", 1, 1.0)],
                                  "k string, ts long, lv double")
        r = spark.createDataFrame([("a", 1, 2.0)],
                                  "k string, ts long, rv double")
        plan = plan_of(asof_join(l, r, ["k"], payload_cols=["rv"]))
        assert plan.count("Exchange") == 1
        assert "Join" not in plan

    def test_gap_fill_no_join(self, spark):
        from filodb_spark.operators.timeseries import gap_fill
        df = spark.createDataFrame([("a", 0, 1.0)],
                                   "k string, ts long, value double")
        plan = plan_of(gap_fill(df, ["k"], 0, 1000, 100))
        assert "Join" not in plan

    def test_tfidf_docfreq_join_broadcasts(self, spark):
        # under the size gate a small vocab estimate pins the broadcast;
        # the over-threshold branch is asserted in test_text_ops
        from filodb_spark.operators.text import tfidf_topk
        d = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        plan = plan_of(tfidf_topk(d, vocab_rows=10))
        assert "BroadcastHashJoin" in plan   # doc-freq side broadcast
        assert "SortMergeJoin" not in plan

    def test_repetition_and_sampling_are_map_only(self, spark):
        """The corpus-hygiene scan stages must stay shuffle-free: at
        100 TB they run as pure map tasks over the input splits."""
        from filodb_spark.operators.pipeline import (ngram_repetition,
                                                     pii_scrub,
                                                     quality_filter,
                                                     stratified_sample)
        d = spark.createDataFrame([(1, "a b c", "en")],
                                  ["doc_id", "text", "lang"])
        for df in (ngram_repetition(d), pii_scrub(d),
                   quality_filter(d),
                   stratified_sample(d, "lang", {"en": 0.5})):
            plan = plan_of(df)
            assert "Exchange" not in plan and "Join" not in plan

    def test_contamination_benchmark_broadcasts(self, spark):
        from filodb_spark.operators.pipeline import contamination_check
        d = spark.createDataFrame([(1, "a b c d e f g h")],
                                  ["doc_id", "text"])
        plan = plan_of(contamination_check(d, d.limit(1), n=4))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        # over-threshold variant keeps an equi-join, never a cartesian
        plan2 = plan_of(contamination_check(d, d.limit(1), n=4,
                                            broadcast_benchmark=False))
        assert "CartesianProduct" not in plan2

    def test_quantize_is_map_only(self, spark):
        from filodb_spark.operators.similarity import quantize_embeddings
        d = spark.createDataFrame([(1, [0.0, 1.0])], ["vec_id", "embedding"])
        plan = plan_of(quantize_embeddings(d))
        assert "Exchange" not in plan and "Join" not in plan


class TestZOrderStorage:
    """write_series_table_zorder: label-addressed queries (no metric)
    filter on the materialized _ix_* column — the predicate must reach
    the parquet scan (PushedFilters) so dictionary/bloom skipping can
    drop files, and results must match the map-value filter exactly."""

    def test_label_filter_pushed_and_values_match(self, spark, tmp_path):
        from filodb_spark.sources.table import (write_series_table,
                                                write_series_table_zorder)
        rows = []
        for m in range(6):
            for i in range(40):
                rows.append(({"__name__": f"metric_{m}", "_ws_": "w",
                              "_ns_": "n", "inst": str(i % 5)},
                             1_700_000_000_000 + i * 60_000, float(m * i)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
        write_series_table_zorder(df, zp, index_labels=("inst",), n_files=4)
        write_series_table(df, sp)

        z = spark.read.parquet(zp).where(F.col("_ix_inst") == "3")
        plan = plan_of(z)
        assert "PushedFilters" in plan and "_ix_inst" in plan
        want = sorted((r["_metric"], r.ts, r.value) for r in
                      spark.read.parquet(sp)
                      .where(F.col("labels")["inst"] == "3")
                      .select("_metric", "ts", "value").collect())
        got = sorted((r["_metric"], r.ts, r.value) for r in
                     z.select("_metric", "ts", "value").collect())
        assert got == want and len(got) == 6 * 8

    def test_zvalue_interleave_bijection_low_bits(self, spark):
        # two distinct column combos must land on distinct z-values
        # (hash collisions aside) and z stays within 2*bits bits
        from filodb_spark.sources.table import _zvalue
        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "c1: string, c2: string")
        vals = [r.z for r in
                df.select(_zvalue(("c1", "c2"), bits=16).alias("z")).collect()]
        assert len(set(vals)) == 4
        assert all(0 <= v < (1 << 32) for v in vals)


class TestPipelineOpPlanShapes:
    """Scale-shape pins for the round-3 pipeline operators: map-only ops
    must compile to ZERO exchanges; join-bearing ops must never emit a
    cartesian/nested-loop join."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"alpha beta w{i} gamma delta", "s" + str(i % 3))
             for i in range(8)], ["doc_id", "text", "source"])

    def test_map_only_ops_have_no_exchange(self, spark):
        from filodb_spark.operators.pipeline import (mix_sources,
                                                     url_domain_filter)
        from filodb_spark.operators.text import chunk_documents
        d = self._docs(spark)
        for df in [chunk_documents(d),
                   url_domain_filter(d),
                   mix_sources(d, {"s0": 2.0, "s1": 0.5})]:
            plan = plan_of(df)
            assert "Exchange" not in plan, plan[:500]

    def test_pack_sequences_single_window_exchange_no_join(self, spark):
        from filodb_spark.operators.pipeline import pack_sequences
        plan = plan_of(pack_sequences(self._docs(spark), budget=8, shards=2))
        assert plan.count("Exchange") == 1     # the per-shard window only
        assert "Join" not in plan

    def test_join_ops_never_cartesian(self, spark):
        from filodb_spark.operators.dedup import segment_dedup
        from filodb_spark.operators.pipeline import source_divergence
        from filodb_spark.operators.similarity import (embedding_outliers,
                                                       semantic_dedup)
        from filodb_spark.operators.text import unigram_logprob
        d = self._docs(spark)
        e = spark.createDataFrame(
            [(i, [float(i % 3) + 0.5, 1.0, -1.0, 0.5, 1.0, 1.0])
             for i in range(6)], ["vec_id", "embedding"])
        # scalar_joins: a broadcast cross join against a ONE-ROW totals
        # aggregate compiles to BroadcastNestedLoopJoin — O(1) payload,
        # the documented acceptable shape; everything else must have none
        for df, scalar_joins in [(segment_dedup(d, seg_tokens=2), 0),
                                 (unigram_logprob(d), 1),
                                 (source_divergence(d), 1),
                                 (semantic_dedup(e, threshold=0.9), 0),
                                 (embedding_outliers(e), 0)]:
            plan = plan_of(df)
            assert "CartesianProduct" not in plan
            assert plan.count("BroadcastNestedLoopJoin") <= scalar_joins


class TestRound3bOpPlanShapes:
    """Scale-shape pins for the round-3 second batch: k-means assignment
    is join-free (centroids live in the plan as literals), the
    token-budget selection keeps its big-side window PARTITIONED (the
    naive global-order window would single-task 100 TB), and the
    two-phase/incremental dedup joins are hash joins, never cartesian."""

    def test_kmeans_assignment_has_no_join(self, spark):
        from filodb_spark.operators.similarity import _kmeans_assign
        vecs = spark.createDataFrame(
            [(1, [0.0, 1.0])], ["vec_id", "embedding"]).select(
            F.col("vec_id").alias("vid"), F.col("embedding").alias("v"))
        plan = plan_of(_kmeans_assign(vecs, [(0, [0.0, 0.0]),
                                             (1, [1.0, 1.0])]))
        assert "Join" not in plan and "Exchange" not in plan

    def test_token_budget_window_is_partitioned(self, spark):
        from filodb_spark.operators.pipeline import token_budget_select
        d = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon") for i in range(8)],
            ["doc_id", "text"])
        out = token_budget_select(d, budget=1000)
        plan = plan_of(out)
        # every Window node must carry a partition spec: the plan string
        # renders unpartitioned windows with an empty partitionBy list
        import re
        for m in re.finditer(r"Window \[[^\]]*\], \[(.*?)\]", plan):
            assert m.group(1).strip(), f"unpartitioned window: {m.group(0)}"
        assert "CartesianProduct" not in plan

    def test_incremental_dedup_hash_joins_only(self, spark):
        from filodb_spark.operators.pipeline import incremental_dedup
        d = spark.createDataFrame(
            [(i, f"text {i}") for i in range(8)], ["doc_id", "text"])
        plan = plan_of(incremental_dedup(d))
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan

    def test_lsh_verify_no_cartesian(self, spark):
        from filodb_spark.operators.dedup import lsh_verified_pairs
        d = spark.createDataFrame(
            [(i, f"some shared words here u{i} and more shared tail")
             for i in range(6)], ["doc_id", "text"])
        plan = plan_of(lsh_verified_pairs(d))
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan


class TestHousekeeping:
    """compact_series_table + expire_partitions: the flush/compaction +
    TTL cycle around the streaming sink."""

    def test_compact_streamed_appends(self, spark, tmp_path):
        from filodb_spark.sources.table import (compact_series_table,
                                                read_series_table)
        import glob
        rows = []
        for i in range(300):
            rows.append(({"__name__": "m", "_ws_": "w", "_ns_": "n",
                          "inst": str(i % 5)},
                         1_700_000_000_000 + i * 60_000,
                         float(i)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        ingest = str(tmp_path / "ingest")
        # simulate many micro-batch appends with cross-batch duplicates
        for _ in range(4):
            df.repartition(8).write.mode("append").parquet(ingest)
        assert len(glob.glob(f"{ingest}/*.parquet")) >= 16
        table = str(tmp_path / "table")
        n = compact_series_table(spark, ingest, table)
        # 300 distinct (series, ts) rows after cross-batch dedup (4x)
        assert n == 300
        got = read_series_table(spark, table)
        assert got.count() == 300
        sub = got.where(F.col("labels")["inst"] == "3")
        assert sub.count() == 60

    def test_expire_partitions_drops_old_dates(self, spark, tmp_path):
        from filodb_spark.sources.table import (expire_partitions,
                                                write_series_table)
        day = 24 * 3600 * 1000
        rows = []
        for d in range(4):                      # 4 consecutive days
            for i in range(10):
                rows.append(({"__name__": "m", "_ws_": "w", "_ns_": "n",
                              "inst": str(i)},
                             1_700_000_000_000 + d * day + i * 60_000,
                             float(i)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        p = str(tmp_path / "t")
        write_series_table(df, p)
        dates = sorted({str(r["date"]) for r in
                        spark.read.parquet(p).select("date").distinct()
                        .collect()})
        assert len(dates) == 4
        deleted = expire_partitions(spark, p, before_date=dates[2])
        assert len(deleted) == 2 and all("date=" in d for d in deleted)
        left = spark.read.parquet(p)
        assert sorted({str(r["date"]) for r in
                       left.select("date").distinct().collect()}) \
            == dates[2:]
        assert left.count() == 20


class TestPqEncode:
    def test_map_only_and_model(self, spark):
        """PQ encoding must stay join-free and exchange-free (codebook
        baked into the plan) — at 100 TB it is a pure map stage."""
        from filodb_spark.operators.similarity import pq_encode
        d = spark.createDataFrame(
            [(0, [0.0, 0.0, 10.0, 10.0]), (1, [1.0, 1.0, -10.0, -10.0]),
             (2, [0.1, 0.1, 9.0, 9.0]), (3, [0.9, 0.9, -9.0, -9.0])],
            "vec_id long, embedding array<double>")
        out = pq_encode(d, m=2, k=2)
        plan = plan_of(out)
        assert "Join" not in plan and "Exchange" not in plan
        rows = {r["vec_id"]: (list(r["codes"]), r["err2"])
                for r in out.collect()}
        # codebook = vectors 0 and 1; vec 2 is nearest 0 in both halves,
        # vec 3 nearest 1 in both; codebook rows encode themselves
        assert rows[0][0] == [0, 0] and rows[0][1] == 0.0
        assert rows[1][0] == [1, 1] and rows[1][1] == 0.0
        assert rows[2][0] == [0, 0]
        assert rows[3][0] == [1, 1]
        assert rows[2][1] > 0.0


class TestIvfPqPlan:
    def test_bucket_equijoin_no_cartesian_codes_only(self, spark):
        """The composed IVF x PQ search must (a) join corpus to queries
        on the bucket column — never a cartesian like plain pq_topk's
        ADC scan — and (b) ship only (id, codes, bucket) out of the
        corpus scan: no embedding floats cross the join."""
        from filodb_spark.operators.similarity import ivfpq_topk
        d = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = d.where(F.col("vec_id") < 5)
        out = ivfpq_topk(d, q, k=3, n_probes=2)
        plan = plan_of(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # hash equi-join keyed on the bucket column
        import re
        assert re.search(r"BroadcastHashJoin \[_bucket#\d+\], \[_bucket#\d+\]",
                         plan), plan[:500]
        # the join's streamed (corpus) side projects codes + bucket only:
        # the ADC scoring above the join references codes#, never the
        # corpus vector column v# (floats never cross the join)
        above_join = plan[:plan.index("BroadcastHashJoin")]
        assert "codes#" in above_join and "v#" not in above_join


class TestRetentionLadder:
    def test_tiers_cascade_and_expire(self, spark, tmp_path):
        """40 days of raw -> 6h and 24h tiers with 7/20/45-day
        retention: each tier keeps exactly its horizon, the coarse tier
        re-aggregates the fine one exactly, and the raw table is pruned
        to its own horizon."""
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        rows = []
        for d in range(40):
            for h in (0, 6, 12, 18):
                for s in range(3):
                    rows.append(({"__name__": "m", "_ws_": "w",
                                  "_ns_": "n", "inst": str(s)},
                                 t0 + d * day + h * 3600 * 1000,
                                 float(d * 100 + h + s)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        now = t0 + 39 * day + 18 * 3600 * 1000
        stats = retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=now,
            tiers=((6 * 3600 * 1000, "6h", 20), (day, "24h", 45)),
            raw_keep_days=7)
        # 24h tier keeps all 40 days x 3 series, plus one extra period
        # per series: with END-inclusive periods (ds_bucket) the h=0
        # sample of day d closes the period ENDING at t0 + d*day, so
        # day 0's h=0 forms its own leading period
        assert stats["24h"] == 41 * 3
        # 6h tier: 20-day horizon (cutoff day has partial coverage by
        # date, so between 19 and 21 days of 4 buckets x 3 series)
        assert 19 * 4 * 3 <= stats["6h"] <= 21 * 4 * 3
        assert len(stats["raw_dropped"]) >= 30   # 40 days - ~7 kept
        # cascade exactness: the final period (ending t0 + 40*day)
        # holds day 39's h=6/12/18 samples (h=0 closed the previous
        # period under end-inclusive semantics)
        t24 = spark.read.parquet(str(tmp_path / "tiers/24h"))
        d39 = {r["labels"]["inst"]: r["sum"] for r in
               t24.where((F.col("ts") > t0 + 39 * day)).collect()}
        want = {str(s): sum(float(39 * 100 + h + s) for h in (6, 12, 18))
                for s in range(3)}
        assert d39 == want
        # raw survivors only inside the 7-day horizon
        left = spark.read.parquet(raw)
        assert left.agg(F.min("ts")).first()[0] >= now - 9 * day

    def test_ladder_stamps_schema_manifest(self, spark, tmp_path):
        """retention_ladder stamps every tier directory with its schema
        + metric set (write_ds_schema_manifest): mounting the tier the
        way cli._open_store does turns per-metric DS routing into a
        metadata-only lookup — ds_schema_of resolves present AND absent
        metrics without evaluating any DataFrame."""
        import dataclasses

        from filodb_spark.promql.compiler import TsStore
        from filodb_spark.sources.table import (read_ds_schema_manifest,
                                                retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        rows = [({"__name__": m, "_ws_": "w", "_ns_": "n"},
                 t0 + d * day + s * 3600 * 1000, float(d + s))
                for m in ("up_total", "mem_used")
                for d in range(5) for s in range(3)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=t0 + 5 * day,
            tiers=((6 * 3600 * 1000, "6h", 30),), raw_keep_days=30,
            schema="counter")
        stamp = read_ds_schema_manifest(spark, str(tmp_path / "tiers/6h"))
        assert stamp == {"schema": "counter",
                         "metrics": ["mem_used", "up_total"]}
        # the cli mount path: stamped metric set attached as a frozenset
        store = TsStore(
            spark.read.parquet(raw).select("labels", "ts", "value"),
            ds_counter_df=spark.read.parquet(str(tmp_path / "tiers/6h"))
            .select("labels", "ts", "value"),
            ds_counter_metrics=frozenset(stamp["metrics"]),
            raw_retention_start_ms=t0 + 2 * day)
        cls = type(store.df)

        def boom(self):
            raise AssertionError("stamped routing touched sample rows")

        orig_empty, orig_collect = cls.isEmpty, cls.collect
        cls.isEmpty = cls.collect = boom
        try:
            assert store.ds_schema_of("up_total") == "counter"
            assert store.ds_schema_of("never_written") is None
        finally:
            cls.isEmpty, cls.collect = orig_empty, orig_collect
        # an unstamped mount of the same tables still probes correctly
        probed = dataclasses.replace(store, ds_counter_metrics=None)
        assert probed.ds_schema_of("up_total") == "counter"
        assert probed.ds_schema_of("never_written") is None

    def test_ladder_stamps_survivors_not_expired_metrics(self, spark,
                                                         tmp_path):
        """The stamp is written AFTER tier retention, from the
        SURVIVING rows (ADVICE r12): a metric whose rows are all older
        than the tier horizon must NOT stay stamped as present —
        ds_schema_of would route it to DS (e.g. tripping the
        2x-ds-resolution lookback rejection) where the probe path
        correctly answers None. A tier whose retention drops
        EVERYTHING is stamped with the empty set, not left unstamped
        (absence answers must stay metadata-only too)."""
        from filodb_spark.sources.table import (read_ds_schema_manifest,
                                                retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        now = 1_700_000_000_000 - (1_700_000_000_000 % day)
        # "old_total" stopped emitting 20 days ago; "live_total" is
        # current. A 10-day tier horizon keeps only live_total rows.
        rows = [({"__name__": "old_total"}, now - 20 * day + s * 3600_000,
                 float(s)) for s in range(3)]
        rows += [({"__name__": "live_total"}, now - 2 * day + s * 3600_000,
                  float(s)) for s in range(3)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=now,
            tiers=((6 * 3600 * 1000, "6h", 10),), raw_keep_days=30,
            schema="counter")
        stamp = read_ds_schema_manifest(spark, str(tmp_path / "tiers/6h"))
        assert stamp == {"schema": "counter", "metrics": ["live_total"]}
        # horizon of 1 day ago drops every period (rows end 2 days ago
        # at +3h): the tier is fully expired -> EMPTY stamp
        retention_ladder(
            spark, raw, str(tmp_path / "tiers2"), now_ms=now,
            tiers=((6 * 3600 * 1000, "6h", 1),), raw_keep_days=30,
            schema="counter")
        stamp2 = read_ds_schema_manifest(
            spark, str(tmp_path / "tiers2/6h"))
        assert stamp2 == {"schema": "counter", "metrics": []}

    def test_refresh_stamp_on_appended_table(self, spark, tmp_path):
        """refresh_ds_schema_stamp re-derives the stamp from the table
        rows — the maintenance hook for streaming-sink tables that gain
        metrics after any earlier stamp."""
        from filodb_spark.sources.table import (read_ds_schema_manifest,
                                                refresh_ds_schema_stamp,
                                                write_ds_schema_manifest)
        path = str(tmp_path / "sink")
        df1 = spark.createDataFrame(
            [({"__name__": "a"}, 1000, 1.0)],
            "labels map<string,string>, ts long, value double")
        df1.write.parquet(path)
        write_ds_schema_manifest(spark, path, "counter", ["a"])
        # the sink appends a NEW metric: the old stamp understates
        df2 = spark.createDataFrame(
            [({"__name__": "b"}, 2000, 2.0)],
            "labels map<string,string>, ts long, value double")
        df2.write.mode("append").parquet(path)
        assert read_ds_schema_manifest(spark, path)["metrics"] == ["a"]
        assert refresh_ds_schema_stamp(spark, path, "counter") is True
        assert read_ds_schema_manifest(spark, path) == {
            "schema": "counter", "metrics": ["a", "b"]}

    def test_fully_expired_tier_counts_zero(self, spark, tmp_path):
        """A tier whose retention drops every date partition must report
        0 survivors, not crash on the unreadable empty directory
        (ADVICE r3)."""
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        rows = [({"__name__": "m", "_ws_": "w", "_ns_": "n"},
                 t0 + d * day, float(d)) for d in range(5)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        # "now" is 100 days past the data: the 5m tier's 1-day horizon
        # expires everything it wrote
        stats = retention_ladder(
            spark, raw, str(tmp_path / "tiers"),
            now_ms=t0 + 100 * day,
            tiers=((3600 * 1000, "1h", 1),), raw_keep_days=1)
        assert stats["1h"] == 0


class TestIvfPqStoredIndex:
    """ivfpq_write_index/ivfpq_read_index: a probe-list IN-filter on the
    stored bucketed index must prune file buckets at planning time
    (SelectedBucketsCount) — unprobed index files never open."""

    TBL = "t_ivfpq_plan_test"

    def test_probe_filter_prunes_buckets_and_preserves_results(self, spark):
        import re
        from filodb_spark.operators import similarity as sim
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        try:
            sim.ivfpq_write_index(sim.ivfpq_index(emb), self.TBL,
                                  n_buckets=64)
            pruned = sim.ivfpq_read_index(spark, self.TBL,
                                          probe_buckets=[3, 7, 11, 15])
            m = re.search(r"SelectedBucketsCount: (\d+) out of 64",
                          plan_of(pruned))
            assert m is not None
            assert 1 <= int(m.group(1)) <= 4   # <=: value-hash collisions
            # no filter -> no pruning claim in the plan
            assert "SelectedBucketsCount: 4 out of" not in plan_of(
                sim.ivfpq_read_index(spark, self.TBL))
            # the pre-filtered stored search equals the direct search
            q = emb.where(F.col("vec_id") < 10)
            probes = sorted({b for r in q.select(
                sim.sign_probe_buckets("embedding", 4).alias("p"))
                .collect() for b in r["p"]})
            stored = sim.ivfpq_read_index(spark, self.TBL,
                                          probe_buckets=probes)
            direct = {(r["qid"], r["nid"]): (r["rank"], r["adist2"])
                      for r in sim.ivfpq_topk(emb, q, k=3).collect()}
            via = {(r["qid"], r["nid"]): (r["rank"], r["adist2"])
                   for r in sim.ivfpq_topk(emb, q, k=3,
                                           index=stored).collect()}
            assert via == direct
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {self.TBL}")


class TestRound5PlanShapes:
    def test_ivfpq_kmeans_is_broadcast_equi_join_no_fit_join(self, spark):
        """Trained-bucket IVFPQ: assignment and encode are literal
        expressions (no fit join anywhere), candidates come from ONE
        broadcast equi-join on the cluster id — never a cartesian."""
        from filodb_spark.operators import similarity as sim
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 10)
        cents = sim.kmeans_fit_portable(emb, k=16, iterations=2)
        plan = plan_of(sim.ivfpq_kmeans_topk(emb, q, k=3, n_buckets=16,
                                             centroids=cents))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan
        # exactly one join: the candidate-generation bucket join
        assert plan.count("HashJoin") == 1

    def test_export_rows_is_map_only(self, spark):
        """The export cascade must compile to a shuffle-free plan —
        rules, drops, and date parts all ride the scan."""
        from filodb_spark.sources.export import ExportRule, export_rows
        rows = [({"__name__": "m", "ns": "a"}, 1_700_000_000_000, 1.0)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        rules = (ExportRule(block_filter_groups=((("ns", "=", "x"),),),
                            drop_labels=("ns",)),
                 ExportRule(allow_filter_groups=((("ns", "=~", "a.*"),),)),)
        plan = plan_of(export_rows(df, rules,
                                   label_columns=(("ns", "ws"),)))
        assert "Exchange" not in plan
        assert "Join" not in plan


class TestCounterRetentionLadder:
    def test_counter_tiers_mount_and_rate(self, spark, tmp_path):
        """schema="counter" tiers keep the dip-preserving row subset;
        a mounted tier serves boundary-crossing rate through the engine
        split with the reset intact."""
        from filodb_spark.promql.compiler import PromQLEngine, TsStore
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        # hourly counter, resets each day
        rows = [({"__name__": "c", "_ws_": "w", "_ns_": "n"},
                 t0 + d * day + h * 3600 * 1000, float(h))
                for d in range(10) for h in range(24)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        now = t0 + 9 * day + 23 * 3600 * 1000
        stats = retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=now,
            tiers=((6 * 3600 * 1000, "6h", 30),), raw_keep_days=3,
            schema="counter")
        t6 = spark.read.parquet(str(tmp_path / "tiers/6h"))
        assert stats["6h"] == t6.count() > 0
        # dips survive: each day's h=0 reset row (0.0 after 23.0)
        dips = t6.where(F.col("value") == 0.0).count()
        assert dips >= 9
        # mount: raw keeps ~3 days, tier covers all history
        raw_left = spark.read.parquet(raw) \
            .select("labels", "ts", "value")
        boundary = raw_left.agg(F.min("ts")).first()[0]
        store = TsStore(raw_left, ds_counter_df=t6.select(
                            "labels", "ts", "value"),
                        raw_retention_start_ms=boundary,
                        ds_resolution_ms=6 * 3600 * 1000)
        eng = PromQLEngine(spark, store)
        out = eng.query_range("increase(c[24h])", t0 + 2 * day, now,
                              6 * 3600 * 1000).collect()
        assert out and all(r["value"] >= 0 for r in out)
        # pre-boundary instants came from the tier (non-empty)
        assert any(r["t"] < boundary for r in out)


class TestHistRetentionLadder:
    def test_hist_tiers_mount_and_query(self, spark, tmp_path):
        """schema="hist" tiers keep the dip-preserving histogram row
        subset (marker on count) with per-period dMin/dMax; a mounted
        tier serves pre-boundary hist instants through the engine
        split."""
        from filodb_spark.promql.compiler import PromQLEngine, TsStore
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        hour = 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        les = [1.0, float("inf")]
        # hourly cumulative histogram, count resets each day
        rows = []
        for d in range(10):
            for h in range(24):
                c = float(2 * h + 1)
                rows.append((
                    {"__name__": "h", "_ws_": "w", "_ns_": "n"},
                    t0 + d * day + h * hour, float(h), c,
                    (les, [float(h), c]),
                    float(h % 3), float(10 + h % 5)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, hist struct<les: array<double>, "
                  "values: array<double>>, min double, max double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        now = t0 + 9 * day + 23 * hour
        stats = retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=now,
            tiers=((6 * hour, "6h", 30),), raw_keep_days=3,
            schema="hist")
        t6 = spark.read.parquet(str(tmp_path / "tiers/6h"))
        assert stats["6h"] == t6.count() > 0
        # dips survive: each day's h=0 reset row (count 1.0 after 47.0)
        assert t6.where(F.col("count") == 1.0).count() >= 9
        # min/max are per-period aggregates, not the row's own values:
        # the (0h,6h] period closes at h=6 (count 13), its segment
        # spans h=1..6 -> min(h%3)=0, max(10+h%5)=14 (h=6's own row
        # values are 0.0/11.0)
        r = t6.where(F.col("count") == 13.0).first()
        assert r["min"] == 0.0 and r["max"] == 14.0
        # mount: raw keeps ~3 days, tier covers all history
        raw_left = spark.read.parquet(raw).select(
            "labels", "ts", "sum", "count", "hist", "min", "max")
        boundary = raw_left.agg(F.min("ts")).first()[0]
        store = TsStore(
            raw_left.where(F.lit(False)).select(
                "labels", "ts", F.col("sum").alias("value")),
            hist_df=raw_left, hist_metrics=("h",),
            ds_hist_df=t6.select("labels", "ts", "sum", "count",
                                 "hist", "min", "max"),
            raw_retention_start_ms=boundary,
            ds_resolution_ms=6 * hour)
        eng = PromQLEngine(spark, store)
        out = eng.query_range("sum_over_time(h[6h])", t0 + 2 * day,
                              now, 6 * hour).collect()
        assert out
        # pre-boundary instants came from the tier
        assert any(r["t"] < boundary for r in out)


class TestRetentionLadderPartkey:
    def test_ladder_cobuilds_ds_covering_index(self, spark, tmp_path):
        """partkey_out rebuilds the index over surviving raw + every
        tier: a series that stopped emitting before raw retention keeps
        its span posting and stays visible to pre-boundary metadata."""
        import dataclasses

        from filodb_spark import metadata
        from filodb_spark.partkey import open_partkey_table
        from filodb_spark.promql.compiler import TsStore
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day = 24 * 3600 * 1000
        hour = 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        rows = [({"__name__": "c", "_ws_": "w", "_ns_": "n"},
                 t0 + d * day + h * hour, float(h))
                for d in range(10) for h in range(24)]
        # retired series: first two days only — gone from raw after
        # expiry, alive in the tier
        rows += [({"__name__": "old", "_ws_": "w", "_ns_": "n"},
                  t0 + d * day + h * hour, float(h))
                 for d in range(2) for h in range(24)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        now = t0 + 9 * day + 23 * hour
        pk = str(tmp_path / "pk")
        stats = retention_ladder(
            spark, raw, str(tmp_path / "tiers"), now_ms=now,
            tiers=((6 * hour, "6h", 30),), raw_keep_days=3,
            schema="counter", partkey_out=pk)
        assert stats["partkey_series"] == 2
        pk_df = open_partkey_table(spark, pk)
        old = pk_df.where("labels['__name__'] = 'old'").collect()
        assert len(old) == 1 and old[0]["first_ts"] == t0
        # mounted with the co-built index, pre-boundary metadata sees it
        raw_left = spark.read.parquet(raw).select("labels", "ts",
                                                  "value")
        boundary = raw_left.agg(F.min("ts")).first()[0]
        t6 = spark.read.parquet(str(tmp_path / "tiers/6h"))
        from filodb_spark.partkey import read_partkey_manifest
        assert read_partkey_manifest(spark, pk)["covers_ds"] is True
        store = TsStore(raw_left,
                        ds_counter_df=t6.select("labels", "ts", "value"),
                        raw_retention_start_ms=boundary,
                        partkey_df=pk_df, partkey_covers_ds=True)
        vals = [r["value"] for r in metadata.label_values(
            store, "__name__", start_ms=t0,
            end_ms=t0 + 2 * day).collect()]
        assert vals == ["c", "old"]
