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
    "bm25_docs",
    "winnow_docs",
]

# $SPARK_GRAFT_BENCH_QUERIES (comma-separated) overrides the list — used by
# scripts/scaling_bench.py to measure the compute-bound kernels (row-level
# joins forced) where parallelism matters, instead of fixed-cost-dominated
# shortcut plans.
if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    BENCH_QUERIES = os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")

QUERY_TIMEOUT_SEC = int(os.environ.get("SPARK_GRAFT_QUERY_TIMEOUT", "1200"))

MEDIANS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_MEDIANS.json")


def _read_cpu() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — the sandbox is a
    shared-host VM where CPU steal can inflate identical runs up to 5×, so
    every timing is recorded with the steal%% observed during it."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:
        return 0, 0


def _load_medians() -> dict:
    try:
        with open(MEDIANS_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_median(name: str, sec: float) -> None:
    """Keep a rolling window of recent per-query timings (unbiased history:
    every attempt is recorded, not just the best-of-N winner)."""
    hist = _load_medians()
    vals = hist.get(name, [])
    vals = (vals + [sec])[-9:]
    hist[name] = vals
    try:
        with open(MEDIANS_PATH, "w") as f:
            json.dump(hist, f, indent=1, sort_keys=True)
    except Exception:
        pass


def _median(vals: list[float]) -> float | None:
    if not vals:
        return None
    s = sorted(vals)
    return s[len(s) // 2]


def run_one(name: str, sf_dir: str, cpus: int) -> int:
    """Child mode: run ONE query in this process, print one JSON line."""
    from py_stringsimjoin_spark.session import get_spark

    # 12g, deliberately NOT larger: this sandbox's hypervisor makes
    # first-touch of fresh pages very slow, and a 32g heap measured 4×
    # SLOWER than 8g on the same query (the JVM gradually faults in the
    # whole heap). 12g avoids both the page-touch tax and agg spills.
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    # Per-query-class shuffle sizing (what a real deployment tunes per job):
    # the row-level join kernels are exploding joins + hash aggregations
    # whose partition count must be sized by the WORKLOAD — aggregate state
    # per task and the (token, salt) key space — not by core count, and held
    # CONSTANT across parallelism levels so the scaling bench compares the
    # same physical plan with more threads, exactly like adding executors to
    # a fixed job on a cluster. Round-4 measurement on jaccard x2 at sf0.1:
    # partitions=4×cores gave 198-313 s at local[4] / 74-100 s at local[16];
    # a constant 64-256 partitions gave 96 s / 44 s (under-partitioning
    # left multi-key salt-bucket collisions + agg spill; see BENCH.md).
    # Small or iteration-heavy queries (connected components ~12 rounds,
    # tiny ANN/textstats jobs) still want partitions = cores.
    sp = (
        int(os.environ.get("SPARK_GRAFT_ROWLEVEL_SP", "256"))
        if "rowlevel" in name
        else cpus
    )
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=sp,
                      app_name=f"bench-{name}")
    import __spark_entry__ as entry

    q = entry.queries()[name]
    t0 = time.time()
    n = q(spark, sf_dir).count()
    sec = round(time.time() - t0, 3)
    print(json.dumps({"name": name, "sec": sec, "rows": n}), flush=True)
    return 0


def _append_bench_md(out: dict) -> None:
    """Self-annotating per-run table in BENCH.md: recorded best-of-N next to
    the rolling 9-run median/min from BENCH_MEDIANS.json, so window-noise
    regressions (a stolen attempt recorded as the artifact) are visible in
    the same row instead of needing a manual history diff.
    SPARK_GRAFT_BENCH_MD=0 disables (scaling_bench appends its own table)."""
    if os.environ.get("SPARK_GRAFT_BENCH_MD", "1") == "0":
        return
    try:
        from datetime import datetime, timezone

        hist = _load_medians()
        cpus, sf, extras = out["cpus"], out["sf"], out["extras"]
        ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
        lines = [
            f"\n## Headline run {ts} — sf{sf} local[{cpus}], "
            f"total {out['value']}s (best-of-N per query; medians from "
            f"BENCH_MEDIANS.json history)\n",
            "| query | sec | attempts | steal% | 9-run median | min |",
            "|---|---|---|---|---|---|",
        ]
        for name, sec in out["queries"].items():
            vals = hist.get(f"{name}@{cpus}@{sf}", [])
            med = _median(vals)
            mn = min(vals) if vals else None
            att = extras.get(f"{name}_attempts", [])
            st = extras.get(f"{name}_steal_pct")
            lines.append(
                f"| {name} | {sec} | {att} | {st} | "
                f"{med if med is not None else '—'} | "
                f"{mn if mn is not None else '—'} |"
            )
        if extras.get("failures"):
            lines.append(f"\nFailures: {extras['failures']}")
        repo = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(repo, "BENCH.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
    except Exception as e:  # markdown annotation must never fail the bench
        print(f"[bench] BENCH.md append failed: {e!r}", file=sys.stderr)


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

    def attempt(name: str):
        """One subprocess run → (sec, rows, steal_pct) or raises/returns err."""
        s0, t0 = _read_cpu()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, cwd=repo,
            timeout=QUERY_TIMEOUT_SEC,
        )
        s1, t1 = _read_cpu()
        steal = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        line = next(
            (ln for ln in reversed(proc.stdout.strip().splitlines())
             if ln.startswith("{")), None)
        if proc.returncode != 0 or line is None:
            return None, (proc.stderr or "")[-800:] or "no output", steal
        rec = json.loads(line)
        return rec, None, steal

    # medians history is per (query, cpus, sf): local[8] and local[32]
    # timings must not pollute each other
    mkey = lambda n: f"{n}@{cpus}@{sf}"
    # Shared-host variance policy (round-3 verdict + advisor): every headline
    # query runs a FIXED number of attempts (default 2) and the recorded
    # timing is the best of them — unconditionally, not only on 3×-median
    # outliers, so a steal window polluting attempt 1 self-corrects instead
    # of becoming the artifact of record. ALL attempts land in
    # extras[*_attempts] and in the BENCH_MEDIANS.json history (not just the
    # min), so the history stays an unbiased record of observed timings.
    n_attempts = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "2")))
    # when EVERY attempt of a query ran in a stolen window (steal% above the
    # same external gate the scaling protocol uses), spend up to this many
    # extra attempts hoping for a clean one — bounded, and recorded like any
    # other attempt, so it cannot bias the history
    n_extra = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "1")))
    clean_pct = float(os.environ.get("SPARK_GRAFT_CLEAN_STEAL_PCT", "3.0"))
    for name in BENCH_QUERIES:
        try:
            recs: list[tuple[dict, float]] = []
            err = None
            budget = n_attempts + n_extra
            tries = 0
            while tries < budget and (
                tries < n_attempts
                or all(s is None or s > clean_pct for _, s in recs)
            ):
                tries += 1
                rec, err, steal = attempt(name)
                if rec is not None:
                    recs.append((rec, steal))
                    _save_median(mkey(name), rec["sec"])
            if not recs:
                failures[name] = err or "no output"
                print(f"[bench] {name}: FAILED", file=sys.stderr, flush=True)
                continue
            rec, steal = min(recs, key=lambda rs: rs[0]["sec"])
            sec = rec["sec"]
            extras[f"{name}_attempts"] = [r["sec"] for r, _ in recs]
            extras[f"{name}_steal_pct"] = steal
            timings[name] = sec
            extras[f"{name}_rows"] = rec["rows"]
            print(
                f"[bench] {name}: {sec}s (attempts "
                f"{[r['sec'] for r, _ in recs]}) rows={rec['rows']} "
                f"steal={steal}%", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            failures[name] = f"timeout after {QUERY_TIMEOUT_SEC}s"
            print(f"[bench] {name}: TIMEOUT", file=sys.stderr, flush=True)
        except Exception as e:  # never let one query zero the whole bench
            failures[name] = repr(e)[:800]
            print(f"[bench] {name}: ERROR {e!r}", file=sys.stderr, flush=True)

    # Full record-linkage pipeline on a synthetic pages corpus whose size
    # scales with sf (sf0.1 → ~20k base pages → ~38k total pages).
    # Benched as ONE spark-submit driving all four stages (--stage all): the
    # standard production deployment shape. Per-stage parquet + manifest
    # checkpoints are still written, so the run stays resumable stage-by-
    # stage; the 4-separate-JVMs resume shape (one spark-submit per stage)
    # remains covered by tests/test_pipeline.py and costs ~3 extra JVM boots
    # (~45 s at sf0.1 — pure fixed cost, irrelevant at production stage
    # walls of hours). SPARK_GRAFT_BENCH_PIPELINE_STAGED=1 restores the
    # per-stage-JVM shape for that measurement.
    # SPARK_GRAFT_BENCH_PIPELINE=0 skips it (quick query-only iterations).
    if os.environ.get("SPARK_GRAFT_BENCH_PIPELINE", "1") == "0":
        total = round(sum(timings.values()), 3)
        if failures:
            extras["failures"] = failures
        print(json.dumps({
            "metric": "headline_total", "value": total, "unit": "sec",
            "queries": timings, "sf": sf, "cpus": cpus, "extras": extras,
        }))
        return 0
    # SPARK_GRAFT_PIPELINE_PAGES overrides the sf-derived corpus size (the
    # scaling harness uses a heavier corpus so the pipeline's stage wall is
    # compute-bound rather than JVM/fixed-cost-bound)
    n_base = max(int(200_000 * sf), 1000) if sf > 0 else 2000
    if os.environ.get("SPARK_GRAFT_PIPELINE_PAGES"):
        n_base = int(os.environ["SPARK_GRAFT_PIPELINE_PAGES"])

    def run_pipeline_once() -> tuple[float, dict]:
        wd = tempfile.mkdtemp(prefix="bench_pipeline_")
        try:
            t0 = time.time()
            staged = os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_STAGED") == "1"
            stages = (
                ("extract", "blocking", "scoring", "clustering")
                if staged else ("all",)
            )
            for stage in stages:
                args = [
                    sys.executable,
                    os.path.join(repo, "scripts", "run_linkage.py"),
                    "--workdir", wd, "--threshold", "0.6", "--stage", stage,
                    "--master", f"local[{cpus}]",
                ]
                if stage in ("extract", "all"):
                    args += ["--synthetic-pages", str(n_base)]
                subprocess.run(args, check=True, capture_output=True, text=True,
                               cwd=repo, timeout=3600)
            wall = round(time.time() - t0, 3)
            manifests = {
                s: json.load(open(os.path.join(wd, f"{s}.manifest.json")))
                for s in ("01_extract", "02_blocking", "03_scoring", "04_clusters")
            }
            stats = {
                "pipeline_stage_wall_sec": round(
                    sum(m["wall_sec"] for m in manifests.values()), 3
                ),
                "pipeline_pages": manifests["01_extract"]["n_rows"],
                "pipeline_candidates": manifests["03_scoring"]["candidates_scored"],
                "pipeline_matches": manifests["03_scoring"]["n_rows"],
                "candidate_pairs_per_sec": manifests["03_scoring"][
                    "candidate_pairs_per_sec"
                ],
            }
            return wall, stats
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    # Same shared-host variance policy as the per-query timings: the
    # pipeline (whose scoring throughput is a headline gate metric) runs a
    # fixed number of attempts and the best wall / its stats are recorded,
    # with every attempt kept in the artifact.
    n_pipe = max(1, int(os.environ.get("SPARK_GRAFT_PIPELINE_ATTEMPTS",
                                       str(n_attempts))))
    pipe_runs: list[tuple[float, dict, float]] = []
    for _ in range(n_pipe):
        try:
            s0, j0 = _read_cpu()
            wall, stats = run_pipeline_once()
            s1, j1 = _read_cpu()
            steal = round(100.0 * (s1 - s0) / max(j1 - j0, 1), 2)
            pipe_runs.append((wall, stats, steal))
            _save_median(mkey("pages_pipeline"), wall)
        except Exception as e:
            failures["pages_pipeline"] = repr(e)[:800]
            print(f"[bench] pages_pipeline: ERROR {e!r}", file=sys.stderr,
                  flush=True)
    if pipe_runs:
        failures.pop("pages_pipeline", None)
        wall, stats, steal = min(pipe_runs, key=lambda t: t[0])
        timings["pages_pipeline"] = wall
        extras.update(stats)
        extras["pages_pipeline_attempts"] = [w for w, _, _ in pipe_runs]
        extras["pages_pipeline_steal_pct"] = steal
        print(
            f"[bench] pages_pipeline: {wall}s (attempts "
            f"{[w for w, _, _ in pipe_runs]}) "
            f"pairs/s={stats['candidate_pairs_per_sec']} steal={steal}%",
            file=sys.stderr, flush=True)

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
    _append_bench_md(out)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
