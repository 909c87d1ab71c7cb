"""Dump .explain('formatted') for a list of queries() entries to files.

Usage: python scripts/dump_plans.py <outdir> <suffix> q1,q2,...
Writes <outdir>/<query>_<suffix>.txt. Used to produce plans/r06/*_before.txt
(from a git worktree at the round-start commit) and *_after.txt (from the
optimized tree).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    from py_stringsimjoin_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
