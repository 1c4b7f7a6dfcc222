"""Round-close checklist runner — the standing gates, one command
(r4 verdict item 4 promoted the sf0.1 sweep to a per-round gate; this
script makes the whole checklist mechanical so no round forgets one).

Runs, in order:
  1. scripts/gate_hygiene.py        (never-gated list + schema audit)
  2. check_oracle at sf0.001        (fast full-registry exactness)
  3. check_oracle at sf0.01         (the driver's gate scale)
  4. check_oracle at sf0.1          (10x gate scale — the certification
                                     level that caught the ds_rollup
                                     half-boundary bug in r4)
  5. pytest tests/ -q               (the full suite)

Prints one summary line per gate and a final PASS/FAIL verdict; exit
code 1 if any gate fails. Bench (bench.py + the interleaved A/B
protocol in PERF.md) stays manual — it needs a quiet box and human
judgment about load.

Usage: python scripts/round_close.py [--skip-tests]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], env_extra: dict | None = None) -> tuple[int, str]:
    env = dict(os.environ, **(env_extra or {}))
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       env=env)
    return p.returncode, p.stdout + p.stderr


def main() -> int:
    results = []

    rc, out = run([sys.executable, "scripts/gate_hygiene.py"])
    never = re.search(r"never driver-gated \((\d+)\)", out)
    ok = rc == 0
    results.append(("gate_hygiene (schema audit)", ok,
                    f"never-gated={never.group(1) if never else '?'}"))

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rc, out = run([sys.executable, "scripts/check_oracle.py",
                       f"/root/testdata/{sf}"])
        m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", out)
        triple = m.groups() if m else ("?", "?", "?")
        ok = rc == 0 and m is not None and triple[1] == "0"
        results.append((f"check_oracle {sf}", ok,
                        f"{triple[0]} exact / {triple[1]} fail / "
                        f"{triple[2]} rows-only"))

    if "--skip-tests" not in sys.argv:
        # the round-close gate runs the FULL suite including the
        # @slow batteries the default profile skips for the driver's
        # time budget (tests/conftest.py)
        rc, out = run([sys.executable, "-m", "pytest", "tests/", "-q"],
                      env_extra={"SPARK_GRAFT_RUN_SLOW": "1"})
        m = re.search(r"(\d+) passed(?:, (\d+) skipped)?", out)
        ok = rc == 0
        results.append(("pytest tests/", ok,
                        m.group(0) if m else out.strip()[-80:]))

    failed = [r for r in results if not r[1]]
    for name, ok, detail in results:
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")
    print(f"\nround-close: {'ALL GREEN' if not failed else 'FAILURES'} "
          f"({len(results) - len(failed)}/{len(results)})")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
