"""Per-query profiling harness (guide §1: measure first).

NOT part of the driver contract — bench.py stays the frozen measurement.
This tool runs ONE queries() entry exactly like ``bench.py --one`` (fresh
session, same conf resolution) but with the Spark event log enabled, then
parses the log to attribute wall-clock to individual jobs: job submit →
job end, the job's description/call-site, stage shuffle bytes and task
counts. That answers "where do the seconds go" (plan-time utility jobs vs
the kernel join vs Python stages) without the (disabled) UI.

Usage:
    python bench_extra.py <query_name> [--noop] [--cpus N] [--sf DIR]

--noop times the query with the no-op sink (guide §1.4) instead of
.count() so column pruning cannot hide work; default mirrors bench.py's
.count() so numbers are comparable with the frozen bench.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    name = sys.argv[1]
    noop = "--noop" in sys.argv
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="ssj_eventlog_")

    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    from py_stringsimjoin_spark.session import get_spark

    sp = (
        int(os.environ.get("SPARK_GRAFT_ROWLEVEL_SP", "256"))
        if "rowlevel" in name
        else cpus
    )
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=sp,
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    import __spark_entry__ as entry

    q = entry.queries()[name]
    t0 = time.time()
    df = q(spark, sf_dir)
    t_plan = time.time() - t0
    if noop:
        df.write.format("noop").mode("overwrite").save()
        n = -1
    else:
        n = df.count()
    sec = time.time() - t0
    print(f"== {name}: total {sec:.3f}s (plan-construction incl. eager jobs "
          f"{t_plan:.3f}s) rows={n}")
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    spark.stop()

    # parse the event log: job timings + stage metrics (rolling-log dir or
    # single-file layout, depending on Spark version)
    logf = None
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if "appstatus" not in f and not f.startswith("."):
                logf = os.path.join(root, f)
    jobs = {}
    stages = {}
    app_start = None
    with open(logf) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {"tt": 0.0, "mx": 0.0})
                st.update(
                    name=si["Stage Name"],
                    tasks=si["Number of Tasks"],
                    sub=si.get("Submission Time"),
                    done=si.get("Completion Time"),
                )
            elif e == "SparkListenerTaskEnd":
                st = stages.setdefault(ev["Stage ID"], {"tt": 0.0, "mx": 0.0})
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                st["tt"] += dur
                st["mx"] = max(st["mx"], dur)
    t_first = min(j["start"] for j in jobs.values()) if jobs else 0
    print(f"-- {len(jobs)} jobs; first job submitted "
          f"{(t_first - app_start) / 1000.0:.3f}s after app start")
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j.get("end", j["start"])
        st = [
            f"{stages[s]['tasks']}t/{stages[s]['tt']:.1f}cs/mx{stages[s]['mx']:.1f}"
            for s in j["stages"]
            if s in stages and stages[s].get("tasks")
        ]
        print(f"job {jid:3d} {dur:8.3f}s (+{gap:6.3f}s gap) "
              f"{j['desc'][-55:]:55s} [{', '.join(st)[:90]}]")
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
