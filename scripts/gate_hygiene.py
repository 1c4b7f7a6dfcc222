"""Gate-window hygiene: the two audits the judge otherwise computes by
hand each round.

1. NEVER-GATED: diff ``all_queries()`` against the union of every
   ``CORRECTNESS_r*.json`` in the repo root and print queries that have
   no driver row in any round (and, separately, queries that have rows
   but never went all-three-green).
2. SCHEMA: build each registered query's DataFrame (no execution beyond
   planning) and flag any output column whose type the driver's
   canonicalizer cannot hash (array/map/struct) — the emb_quantize
   round-3 failure class.

Usage: python scripts/gate_hygiene.py [sf_dir]
Exit code 1 if any non-hashable output column exists (never-gated
queries are informational: the window only holds 50 per round).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NON_HASHABLE = ("array", "map", "struct")


def gated_names() -> tuple[dict, dict]:
    """name -> rounds with any row; name -> rounds with all-three-green."""
    seen: dict[str, list] = {}
    green: dict[str, list] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            seen.setdefault(name, []).append(rnd)
            ok = (row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match"))
            # rows-only ops can't hash-match by design; the driver records
            # spark_rows with err=no_oracle and null match flags — that IS
            # their intended green
            rows_only_ok = (row.get("spark_rows") is not None
                            and row.get("err") == "no_oracle")
            if ok or rows_only_ok:
                green.setdefault(name, []).append(rnd)
    return seen, green


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from filodb_spark.driver_queries import all_queries
    queries, oracles = all_queries()

    seen, green = gated_names()
    never_gated = [n for n in queries if n not in seen]
    never_green = [n for n in queries if n in seen and n not in green]

    print(f"registry: {len(queries)} queries, {len(oracles)} oracle-paired")
    print(f"never driver-gated ({len(never_gated)}):")
    for n in never_gated:
        print(f"  {n}")
    print(f"gated but never green ({len(never_green)}):")
    for n in never_green:
        print(f"  {n}")

    from filodb_spark.session import get_spark
    spark = get_spark()
    bad = []
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # planning failure is itself a finding
            bad.append((name, f"PLAN ERROR: {e}"))
            continue
        for field in df.schema.fields:
            t = field.dataType.simpleString()
            if t.startswith(NON_HASHABLE):
                bad.append((name, f"{field.name}: {t}"))
    if bad:
        print(f"NON-HASHABLE output columns ({len(bad)}):")
        for name, msg in bad:
            print(f"  {name} -> {msg}")
        sys.exit(1)
    print("schema audit: all output columns scalar-hashable")


if __name__ == "__main__":
    main()
