"""CurationPipeline: end-to-end curation over the synthetic pages corpus,
stage resume, and PII scrubbing on the way through."""

import datetime

import pytest
from pyspark.sql import functions as F

from py_stringsimjoin_spark.plans.curation import CurationPipeline
from py_stringsimjoin_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    base = generate_pages(spark, n_base=60, dup_fraction=0.5, seed=11).drop(
        "cluster_id"
    )
    # planted rows: a recrawl of the same canonical resource (http vs
    # https + tracking param; later warc_ts must win) and a PII carrier
    extra = spark.createDataFrame(
        [
            (
                "http://www.recrawl.example/a?utm_source=x",
                datetime.datetime(2026, 1, 1),
                b"<html>old</html>",
                "old crawl body words here padding to pass the word gate ok",
                "en",
            ),
            (
                "https://recrawl.example/a",
                datetime.datetime(2026, 2, 1),
                b"<html>new</html>",
                "new crawl body words here padding to pass the word gate ok",
                "en",
            ),
            (
                "https://pii.example/contact",
                datetime.datetime(2026, 2, 1),
                b"<html>c</html>",
                "reach us at crawler@pii.example or +1 555-123-4567 thanks "
                "and some more words to pass the minimum word gate easily",
                "en",
            ),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return base.unionByName(extra)


def test_end_to_end(spark, pages, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("curation"))
    pipe = CurationPipeline(spark, wd, neardup_threshold=0.8, min_words=5)
    out = pipe.run(pages)
    m = pipe.metrics()

    # canonical recrawl dedup: the two recrawl.example rows collapsed to
    # the LATER crawl
    canon = spark.read.parquet(f"{wd}/01_canon")
    rec = canon.where(F.col("canonical_url") == "https://recrawl.example/a").collect()
    assert len(rec) == 1 and rec[0].text.startswith("new crawl")
    assert m["01_canon"]["n_rows"] < m["01_canon"]["n_in"]

    # near-dup stage removed planted duplicates (dup_fraction 0.5)
    assert m["02_neardup"]["n_rows"] < m["02_neardup"]["n_in"]

    # PII scrubbed in the surviving corpus
    pii_row = out.where(F.col("url") == "https://pii.example/contact").collect()
    assert len(pii_row) == 1
    assert "<EMAIL>" in pii_row[0].text and "<PHONE>" in pii_row[0].text
    assert "crawler@pii.example" not in pii_row[0].text

    # splits assigned over every survivor
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    assert out.where(F.col("split").isNull()).count() == 0

    # monotone survivor counts down the pipeline
    assert (
        m["05_splits"]["n_rows"]
        == m["04_scrub"]["n_rows"]
        == m["03_hygiene"]["n_rows"]
        <= m["02_neardup"]["n_rows"]
        <= m["01_canon"]["n_rows"]
    )


def test_resume_skips_done_stages(spark, pages, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("curation_resume"))
    pipe = CurationPipeline(spark, wd, min_words=5)
    pipe.run(pages)
    first = {k: v.get("wall_sec") for k, v in _walls(wd).items()}
    # second run resumes from manifests: no stage is recomputed, so every
    # manifest (including wall_sec) is byte-identical
    pipe2 = CurationPipeline(spark, wd, min_words=5)
    pipe2.run(pages)
    assert {k: v.get("wall_sec") for k, v in _walls(wd).items()} == first
    # changing a param invalidates downstream fingerprints and recomputes
    pipe3 = CurationPipeline(spark, wd, min_words=6)
    pipe3.run(pages)
    assert {k: v.get("wall_sec") for k, v in _walls(wd).items()} != first


def _walls(wd):
    import json
    import os

    out = {}
    for name in ("01_canon", "02_neardup", "03_hygiene", "04_scrub", "05_splits"):
        p = os.path.join(wd, f"{name}.manifest.json")
        if os.path.exists(p):
            with open(p) as f:
                out[name] = json.load(f)
    return out
