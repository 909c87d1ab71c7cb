"""Benchmark harness (driver contract).

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Isolation protocol: every headline query runs in its OWN subprocess (fresh
JVM + fresh Python workers) — the production spark-submit deployment shape.
This (a) makes one query's crash unable to zero the whole bench (the final
JSON line is ALWAYS printed, failed queries land in extras.failures), and
(b) sidesteps a sandbox-VM anomaly where long-lived local[32] sessions
degrade/crash Python-UDF stages (see BENCH.md). Timings exclude JVM startup:
each child times only the query's execution and reports it on stdout.

Also usable for the two-parallelism scaling evidence:
    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
(see scripts/scaling_bench.py, which runs both and writes BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

BENCH_QUERIES = [
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

# $SPARK_GRAFT_BENCH_QUERIES (comma-separated) overrides the list — used by
# scripts/scaling_bench.py to measure the compute-bound kernels (row-level
# joins forced) where parallelism matters, instead of fixed-cost-dominated
# shortcut plans.
if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    BENCH_QUERIES = os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")

QUERY_TIMEOUT_SEC = int(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "1200"))


def run_one(name: str, sf_dir: str, cpus: int) -> int:
    """Child mode: run ONE query in this process, print one JSON line."""
    from py_stringsimjoin_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name=f"bench-{name}")
    import __spark_entry__ as entry

    q = entry.queries()[name]
    t0 = time.time()
    n = q(spark, sf_dir).count()
    sec = round(time.time() - t0, 3)
    print(json.dumps({"name": name, "sec": sec, "rows": n}), flush=True)
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        return run_one(sys.argv[2], sf_dir, cpus)

    repo = os.path.dirname(os.path.abspath(__file__))
    timings: dict[str, float] = {}
    extras: dict = {}
    failures: dict[str, str] = {}

    for name in BENCH_QUERIES:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, cwd=repo,
                timeout=QUERY_TIMEOUT_SEC,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.strip().splitlines())
                 if ln.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                failures[name] = (proc.stderr or "")[-800:] or "no output"
                print(f"[bench] {name}: FAILED rc={proc.returncode}",
                      file=sys.stderr, flush=True)
                continue
            rec = json.loads(line)
            timings[name] = rec["sec"]
            extras[f"{name}_rows"] = rec["rows"]
            print(f"[bench] {name}: {rec['sec']}s rows={rec['rows']}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            failures[name] = f"timeout after {QUERY_TIMEOUT_SEC}s"
            print(f"[bench] {name}: TIMEOUT", file=sys.stderr, flush=True)
        except Exception as e:  # never let one query zero the whole bench
            failures[name] = repr(e)[:800]
            print(f"[bench] {name}: ERROR {e!r}", file=sys.stderr, flush=True)

    # Full record-linkage pipeline on a synthetic pages corpus whose size
    # scales with sf (sf0.1 → ~20k base pages → ~38k total pages).
    # Each stage runs in its OWN spark-submit-style process — the production
    # deployment shape (checkpoint + manifest resume between JVMs).
    n_base = max(int(200_000 * sf), 1000) if sf > 0 else 2000
    wd = tempfile.mkdtemp(prefix="bench_pipeline_")
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
        manifests = {
            s: json.load(open(os.path.join(wd, f"{s}.manifest.json")))
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
    except Exception as e:
        failures["pages_pipeline"] = repr(e)[:800]
        print(f"[bench] pages_pipeline: ERROR {e!r}", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(wd, ignore_errors=True)

    if failures:
        extras["failures"] = failures
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
