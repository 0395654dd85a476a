"""Capture .explain("formatted") output for registry queries.

Usage:
    python tools/capture_plans.py OUTDIR [--suffix _after] [--sf DIR] q1 q2 ...

Writes OUTDIR/<query><suffix>.txt with the formatted physical plan of
each named registry query. Run it from a worktree of an older commit
(with --suffix _before) to reconstruct the pre-change plans the
optimization round compares against; the testdata is deterministic, so
the plan shape is a property of the CODE at that commit.

The session mirrors the bench posture (AQE off) so plans are the final
static plans, not `AdaptiveSparkPlan isFinalPlan=false` wrappers.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)

    from trendengine_spark.session import get_spark
    from trendengine_spark.queries import all_queries

    spark = get_spark(
        app_name="capture_plans",
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = all_queries()
    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep going; record the failure
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
