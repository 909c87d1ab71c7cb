"""spark-submit entrypoint for the record-linkage pipeline.

Usage (local sandbox):
    python scripts/run_linkage.py --pages /path/pages_parquet --workdir /tmp/wd \
        --threshold 0.6 [--stage all|extract|blocking|scoring|clustering] \
        [--join-attr text|title] [--partitions 256] [--synthetic-pages 20000]

    # fold a crawl increment into an existing workdir (delta linkage):
    python scripts/run_linkage.py --workdir /tmp/wd --stage increment \
        --pages /path/new_pages_parquet

On a cluster the same file ships via:
    spark-submit --py-files py_stringsimjoin_spark.zip scripts/run_linkage.py ...

Each stage is independently resumable from its parquet + manifest checkpoint
(plans/pipeline.py); re-running with the same params skips completed stages,
so a killed job continues where it stopped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="input pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic-pages", type=int, default=0,
                    help="generate N base pages instead of reading --pages")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--threshold", type=float, default=0.6)
    ap.add_argument("--measure", default="jaccard")
    ap.add_argument("--stage", default="all",
                    choices=["all", "extract", "blocking", "scoring",
                             "clustering", "increment"])
    ap.add_argument("--join-attr", default="text", choices=["text", "title"])
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from py_stringsimjoin_spark.plans.pipeline import LinkagePipeline
    from py_stringsimjoin_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="linkage_pipeline")
    pipe = LinkagePipeline(
        spark, args.workdir, threshold=args.threshold, measure=args.measure,
        join_attr=args.join_attr, num_partitions=args.partitions,
    )

    if args.stage == "increment":
        if not args.pages:
            ap.error("--pages required for increment")
        pipe.increment(spark.read.parquet(args.pages))
        print(json.dumps(pipe.metrics(), indent=2))
        return 0

    if args.stage in ("all", "extract"):
        if args.synthetic_pages:
            from py_stringsimjoin_spark.sources.pages import generate_pages

            pages = generate_pages(spark, n_base=args.synthetic_pages).drop("cluster_id")
        else:
            if not args.pages:
                ap.error("--pages or --synthetic-pages required for extract")
            pages = spark.read.parquet(args.pages)
        pipe.extract(pages)
    if args.stage in ("all", "blocking"):
        pipe.blocking()
    if args.stage in ("all", "scoring"):
        pipe.scoring()
    if args.stage in ("all", "clustering"):
        pipe.clustering()

    print(json.dumps(pipe.metrics(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
