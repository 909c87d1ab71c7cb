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


def test_increment_equals_full_run(spark, tmp_path_factory):
    """increment(delta) must equal a full re-run over (base ∪ delta),
    including the hard cases: a recrawl REPLACING an existing page's text
    (near-dup edges must be dropped, groups may split) and a bridge page
    merging two existing near-dup groups (representative changes)."""
    base = generate_pages(spark, n_base=40, dup_fraction=0.5, seed=23).drop(
        "cluster_id"
    )
    texts = [r.text for r in base.orderBy("url").limit(2).collect()]
    delta = spark.createDataFrame(
        [
            # recrawl of an existing canonical resource with NEW text
            # (same scheme — http vs https are distinct canonical keys)
            (
                "http://inc.example/replaced?fbclid=zzz",
                datetime.datetime(2026, 3, 1),
                b"<html>v2</html>",
                "completely rewritten page body with enough words to pass gates",
                "en",
            ),
            # near-dup of an existing base page (joins its group via the
            # persisted buckets)
            (
                "https://inc.example/neardup",
                datetime.datetime(2026, 3, 1),
                b"<html>nd</html>",
                texts[0] + " tail",
                "en",
            ),
            # brand-new unrelated page
            (
                "https://inc.example/fresh",
                datetime.datetime(2026, 3, 1),
                b"<html>f</html>",
                "an entirely unrelated fresh document with plenty of words here",
                "en",
            ),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    first_crawl = spark.createDataFrame(
        [
            (
                "http://www.inc.example/replaced?utm_source=x",
                datetime.datetime(2026, 1, 1),
                b"<html>v1</html>",
                texts[1],
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    base = base.unionByName(first_crawl)

    wd_full = str(tmp_path_factory.mktemp("cur_full"))
    wd_inc = str(tmp_path_factory.mktemp("cur_inc"))
    kw = dict(neardup_threshold=0.8, min_words=5)

    full = CurationPipeline(spark, wd_full, **kw).run(base.unionByName(delta))
    pipe = CurationPipeline(spark, wd_inc, **kw)
    pipe.run(base)
    inc = pipe.increment(delta)

    f = {(r.url, r.text, r.split) for r in full.collect()}
    i = {(r.url, r.text, r.split) for r in inc.collect()}
    assert f == i, (sorted(f - i)[:3], sorted(i - f)[:3])

    # the replacement really happened: v2 text survives under the NEW url,
    # the v1 canonical key no longer carries the old text
    canon = spark.read.parquet(f"{wd_inc}/01_canon")
    rep = canon.where(
        F.col("canonical_url") == "http://inc.example/replaced"
    ).collect()
    assert len(rep) == 1 and rep[0].text.startswith("completely rewritten")
