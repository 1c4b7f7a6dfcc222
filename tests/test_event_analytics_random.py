"""Randomized model validation for the event-analytics family: many
random event streams (bursty timestamps, duplicate instants, users who
never start / stall mid-funnel / complete repeatedly) evaluated in ONE
Spark job per operator and compared against pure-Python reference
models. Deterministic seed."""

import random

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.timeseries import (cohort_retention, funnel,
                                               session_transitions)

SEED = 1234
N_USERS = 60
STEPS = ["signup", "view", "click", "purchase"]
TYPES = STEPS + ["error"]
WINDOW_MS = 5_000
PERIOD_MS = 1_000
GAP_MS = 700


def gen_events():
    rng = random.Random(SEED)
    rows = []
    eid = 0
    for u in range(N_USERS):
        n = rng.randint(0, 30)
        t = rng.randint(0, 2_000)
        for _ in range(n):
            t += rng.choice([0, 1, 5, 50, 400, 900, 2_500])
            rows.append((u, t, rng.choice(TYPES), eid))
            eid += 1
    return rows


def py_funnel(rows, steps, window_ms):
    """Greedy earliest-match model: events in (ts, arrival) order per
    user; arrival order is irrelevant because matching scans sorted
    distinct candidates per step (mirrors the min-aggregation)."""
    by_user = {}
    for u, t, et, _ in rows:
        by_user.setdefault(u, []).append((t, et))
    out = {}
    for u, evs in by_user.items():
        ts = []
        step1 = sorted(t for t, et in evs if et == steps[0])
        if not step1:
            continue
        ts.append(step1[0])
        for d in range(1, len(steps)):
            cand = sorted(
                t for t, et in evs
                if et == steps[d] and t > ts[d - 1]
                and (window_ms is None or t - ts[0] <= window_ms))
            if not cand:
                break
            ts.append(cand[0])
        out[u] = ts
    return out


class TestRandomizedModels:
    @pytest.fixture(scope="class")
    def ev(self, spark):
        df = spark.createDataFrame(
            gen_events(),
            "user_id long, ts long, event_type string, event_id long")
        return df.localCheckpoint(eager=True)

    def test_funnel_matches_model(self, spark, ev):
        got = {r["user_id"]: [r[f"t_{d}"] for d in range(1, 5)
                              if r[f"t_{d}"] is not None]
               for r in funnel(ev, STEPS, window_ms=WINDOW_MS).collect()}
        want = py_funnel(gen_events(), STEPS, WINDOW_MS)
        assert got == want

    def test_cohort_matches_model(self, spark, ev):
        rows = gen_events()
        first = {}
        for u, t, _, _ in rows:
            first[u] = min(first.get(u, t), t)
        cells = {}
        cohorts = {}
        for u, t, _, _ in rows:
            c = first[u] // PERIOD_MS
            off = t // PERIOD_MS - c
            cells.setdefault((c, off), set()).add(u)
            cohorts.setdefault(c, set()).add(u)
        got = {(r["cohort_period"], r["period_offset"]):
               (r["n_active"], r["n_cohort"])
               for r in cohort_retention(ev, period_ms=PERIOD_MS).collect()}
        want = {(c, o): (len(us), len(cohorts[c]))
                for (c, o), us in cells.items()}
        assert got == want

    def test_transitions_match_model(self, spark, ev):
        rows = gen_events()
        by_user = {}
        for u, t, et, eid in rows:
            by_user.setdefault(u, []).append((t, eid, et))
        trans = {}
        for u, evs in by_user.items():
            evs.sort()
            sessions = []
            for t, eid, et in evs:
                if not sessions or t - sessions[-1][-1][0] > GAP_MS:
                    sessions.append([])
                sessions[-1].append((t, eid, et))
            for sess in sessions:
                for (t1, e1, a), (t2, e2, b) in zip(sess, sess[1:]):
                    trans[(a, b)] = trans.get((a, b), 0) + 1
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in session_transitions(
                   ev, ["user_id"], gap_ms=GAP_MS,
                   tie_col="event_id").collect()}
        assert got == trans
