"""Benchmark harness (driver contract).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Also usable for the two-parallelism scaling evidence:
    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
(see scripts/scaling_bench.py, which runs both and writes BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from py_stringsimjoin_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="bench")

    import __spark_entry__ as entry

    qs = entry.queries()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    bench_queries = [
        "jaccard_part",
        "cosine_part",
        "edit_distance_part",
        "jaccard_docs",
        "minhash_pairs_docs",
        "simhash_pairs_docs",
        "ann_topk_embeddings",
        "cosine_pairs_embeddings",
        "tokenstats_docs",
        "connected_components_part",
    ]
    for name in bench_queries:
        q = qs[name]
        t0 = time.time()
        n = q(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        extras[f"{name}_rows"] = n
        print(f"[bench] {name}: {timings[name]}s rows={n}", file=sys.stderr, flush=True)
        # joins persist ranked-token intermediates; drop them so queries
        # are independent and the long session doesn't accumulate heap
        spark.catalog.clearCache()

    # Full record-linkage pipeline on a synthetic pages corpus whose size
    # scales with sf (sf0.1 → ~20k base pages → ~38k total pages).
    # Each stage runs in its OWN spark-submit-style process — the production
    # deployment shape (checkpoint + manifest resume between JVMs); it also
    # sidesteps a local-mode-only anomaly where long sessions degrade
    # Python-UDF stages at high thread counts (see BENCH.md).
    import subprocess

    n_base = max(int(200_000 * sf), 1000) if sf > 0 else 2000
    wd = tempfile.mkdtemp(prefix="bench_pipeline_")
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        t0 = time.time()
        for stage in ("extract", "blocking", "scoring", "clustering"):
            args = [
                sys.executable, os.path.join(repo, "scripts", "run_linkage.py"),
                "--workdir", wd, "--threshold", "0.6", "--stage", stage,
                "--master", f"local[{cpus}]",
            ]
            if stage == "extract":
                args += ["--synthetic-pages", str(n_base)]
            subprocess.run(args, check=True, capture_output=True, text=True,
                           cwd=repo, timeout=3600)
        timings["pages_pipeline"] = round(time.time() - t0, 3)
        import json as _json

        manifests = {
            s: _json.load(open(os.path.join(wd, f"{s}.manifest.json")))
            for s in ("01_extract", "02_blocking", "03_scoring", "04_clusters")
        }
        extras["pipeline_stage_wall_sec"] = round(
            sum(m["wall_sec"] for m in manifests.values()), 3
        )
        extras["pipeline_pages"] = manifests["01_extract"]["n_rows"]
        extras["pipeline_candidates"] = manifests["03_scoring"]["candidates_scored"]
        extras["pipeline_matches"] = manifests["03_scoring"]["n_rows"]
        extras["candidate_pairs_per_sec"] = manifests["03_scoring"][
            "candidate_pairs_per_sec"
        ]
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "extras": extras,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
