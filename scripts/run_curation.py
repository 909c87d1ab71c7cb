"""spark-submit entrypoint for the corpus-curation pipeline.

Usage (local sandbox):
    python scripts/run_curation.py --pages /path/pages_parquet --workdir /tmp/wd \
        [--stage all|canon|neardup|hygiene|scrub|splits] \
        [--neardup-threshold 0.8] [--min-words 5] [--synthetic-pages 2000]

    # fold a crawl increment into an existing workdir (delta curation —
    # probes the persisted LSH buckets, rebuilds clusters over the edge set):
    python scripts/run_curation.py --workdir /tmp/wd --stage increment \
        --pages /path/new_pages_parquet

On a cluster the same file ships via:
    spark-submit --py-files py_stringsimjoin_spark.zip scripts/run_curation.py ...

Each stage is independently resumable from its parquet + manifest checkpoint
(plans/curation.py); re-running with the same params skips completed stages.
The final stage prints the per-stage metrics (rows in/out, per-rule quality
drop counts, wall-clock) as one JSON document.
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
    ap.add_argument("--stage", default="all",
                    choices=["all", "canon", "neardup", "hygiene", "scrub",
                             "splits", "increment"])
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--max-words", type=int, default=100000)
    ap.add_argument("--boilerplate-min-pages", type=int, default=5)
    ap.add_argument("--split-seed", default="curation")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from py_stringsimjoin_spark.plans.curation import CurationPipeline
    from py_stringsimjoin_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="curation_pipeline")
    pipe = CurationPipeline(
        spark, args.workdir,
        neardup_threshold=args.neardup_threshold,
        min_words=args.min_words,
        max_words=args.max_words,
        boilerplate_min_pages=args.boilerplate_min_pages,
        split_seed=args.split_seed,
    )

    def _pages():
        if args.synthetic_pages:
            from py_stringsimjoin_spark.sources.pages import generate_pages

            return generate_pages(spark, n_base=args.synthetic_pages).drop("cluster_id")
        if not args.pages:
            ap.error("--pages or --synthetic-pages required")
        return spark.read.parquet(args.pages)

    if args.stage == "increment":
        pipe.increment(_pages())
        print(json.dumps(pipe.metrics(), indent=2))
        return 0

    if args.stage in ("all", "canon"):
        pipe.canon(_pages())
    if args.stage in ("all", "neardup"):
        pipe.neardup()
    if args.stage in ("all", "hygiene"):
        pipe.hygiene()
    if args.stage in ("all", "scrub"):
        pipe.scrub()
    if args.stage in ("all", "splits"):
        pipe.splits()
    print(json.dumps(pipe.metrics(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
