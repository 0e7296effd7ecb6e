"""Dump full .explain("formatted") output per headline query to
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan-evidence
capture (guide §1: record plan shape before/after every change).

    python tools/dump_plans.py <tag> <suffix> [query ...]

e.g. ``python tools/dump_plans.py r11 before`` captures every benched
headline query. Queries whose fn() itself runs terminal actions (streaming
replays, iterative CC loops, ANN index builds) still produce the plan of
the RETURNED DataFrame; the driving stages' shapes live in the operator
docstrings and the audit tool (tools/explain.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.workloads import load_all


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    if not names:
        import bench

        names = list(bench.HEADLINE)
    reg = load_all()
    spark = get_spark("dump-plans")
    sf = "/root/testdata/sf0.01"
    for name in names:
        t0 = time.time()
        try:
            plan = (
                reg[name]
                .fn(spark, sf)
                ._jdf.queryExecution()
                .explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            )
        except Exception as exc:  # capture the failure instead of dying mid-sweep
            plan = f"ERROR capturing plan: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"{name}: {time.time() - t0:.1f}s, {len(plan)} chars", flush=True)


if __name__ == "__main__":
    main()
