"""Measure prepared-corpus reuse (PreparedSetSimCorpus) on the part table.

In ONE session: two direct row-level joins (each pays tokenize + ordering +
rank) vs prepare-once + the same two joins over the prepared corpus. Prints
one JSON line and appends a summary to BENCH.md. The oracle-parity of the
prepared path is covered by tests/test_round4_features.py; this script is
the BENCH evidence for the reuse speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from py_stringsimjoin_spark.functions.tokenizers import WhitespaceTokenizer  # noqa: E402
from py_stringsimjoin_spark.operators.prepared import PreparedSetSimCorpus  # noqa: E402
from py_stringsimjoin_spark.operators.set_sim_join import set_sim_join_pairs  # noqa: E402
from py_stringsimjoin_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=4 * cpus,
                      app_name="prepared-bench")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_name")
    tok = WhitespaceTokenizer(return_set=True)
    jobs = [("jaccard", 0.5), ("cosine", 0.7)]

    direct: dict[str, float] = {}
    rows: dict[str, int] = {}
    for m, t in jobs:
        t0 = time.time()
        n = set_sim_join_pairs(
            m, part, part, "p_partkey", "p_partkey", "p_name", "p_name",
            tok, t, allow_empty=False, self_join_dedup=True, value_dedup=False,
        ).count()
        direct[m] = round(time.time() - t0, 3)
        rows[m] = n

    t0 = time.time()
    corpus = PreparedSetSimCorpus(part, "p_partkey", "p_name", tok)
    corpus.ranked.count()  # force materialization into the cache
    prep_sec = round(time.time() - t0, 3)

    prepared: dict[str, float] = {}
    for m, t in jobs:
        t0 = time.time()
        n = corpus.join_pairs(m, t, allow_empty=False, self_join_dedup=True).count()
        prepared[m] = round(time.time() - t0, 3)
        assert n == rows[m], (m, n, rows[m])

    out = {
        "metric": "prepared_corpus_reuse",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "direct_sec": direct,
        "prepare_sec": prep_sec,
        "prepared_join_sec": prepared,
        "rows": rows,
        "reuse_speedup": {
            m: round(direct[m] / prepared[m], 2) if prepared[m] else None
            for m, _ in jobs
        },
    }
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Prepared-corpus reuse {ts} — {sf_dir}, local[{cpus}]\n\n"
            f"| join | direct (prep+join) | prepared join only | speedup |\n"
            f"|---|---|---|---|\n"
            + "".join(
                f"| {m} | {direct[m]}s | {prepared[m]}s | "
                f"{out['reuse_speedup'][m]}× |\n"
                for m, _ in jobs
            )
            + f"\nOne-time prepare (tokenize+ordering+rank, cached): "
            f"{prep_sec}s; identical row counts both paths ({rows}).\n"
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
