"""Checkpointed corpus-curation pipeline for web-text training data.

The training-data counterpart of :class:`.pipeline.LinkagePipeline`: the
same Stage/manifest machinery (parquet + fingerprint per stage, each
stage independently resumable), composing this repo's hygiene operators
into the standard curation order a Common-Crawl-style corpus goes
through before it trains anything:

  01_canon    canonical-URL recrawl dedup — ONE row per canonical URL
              (latest ``warc_ts`` wins, ties by url) via
              functions/urls.normalize_url_expr
  02_neardup  MinHash-LSH near-duplicate clusters over ``text``
              (operators/dedup.minhash_dedup → connected components);
              one representative (min url) survives per cluster
  03_hygiene  site-level boilerplate line removal (grouped by url host)
              then the Gopher-style per-rule quality gate on the CLEANED
              text; dropped rows carry their reason in the manifest
  04_scrub    PII redaction (map-only regexp chain)
  05_splits   deterministic leakage-safe train/val/test assignment keyed
              on the url (operators/splits.assign_splits)

Every stage writes parquet + a manifest with row counts, per-partition
lineage, and wall-clock; a re-run skips stages whose fingerprint (params
+ stage name) matches — resume after a crash re-reads, never recomputes.
Each stage is pure DataFrame work that scales exactly as its operator's
own docstring describes; the pipeline adds no collects and no state
beyond the manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.pii import redact_pii_expr
from ..functions.tokenizers import ShingleTokenizer
from ..functions.urls import normalize_url_expr, url_host_expr
from ..operators.dedup import dedup_groups, minhash_dedup
from ..operators.splits import assign_splits
from ..operators.textclean import gopher_quality_filter, remove_boilerplate_lines
from .pipeline import Stage, _fingerprint


class CurationPipeline:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        neardup_threshold: float = 0.8,
        min_words: int = 5,
        max_words: int = 100000,
        boilerplate_min_pages: int = 5,
        split_weights: dict | None = None,
        split_seed: str = "curation",
    ):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.params = {
            "neardup_threshold": neardup_threshold,
            "min_words": min_words,
            "max_words": max_words,
            "boilerplate_min_pages": boilerplate_min_pages,
            "split_weights": sorted((split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}).items()),
            "split_seed": split_seed,
        }
        self.neardup_threshold = neardup_threshold
        self.min_words = min_words
        self.max_words = max_words
        self.boilerplate_min_pages = boilerplate_min_pages
        self.split_weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
        self.split_seed = split_seed

    def _stage(self, name: str):
        return Stage(self.workdir, name), _fingerprint({**self.params, "stage": name})

    # ---------------------------------------------------------------- stages
    def canon(self, pages: DataFrame) -> dict:
        st, fp = self._stage("01_canon")
        if st.done(fp):
            return st.manifest()
        n_in = pages.count()
        canon = pages.withColumn("canonical_url", normalize_url_expr(F.col("url")))
        w = Window.partitionBy("canonical_url").orderBy(
            F.col("warc_ts").desc(), F.col("url").asc()
        )
        kept = (
            canon.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("url", "canonical_url", "warc_ts", "text", "lang")
        )
        return st.write(kept, fp, {"n_in": int(n_in)})

    def neardup(self) -> dict:
        st, fp = self._stage("02_neardup")
        if st.done(fp):
            return st.manifest()
        docs = Stage(self.workdir, "01_canon").read(self.spark)
        pairs = minhash_dedup(
            docs, "url", "text",
            threshold=self.neardup_threshold,
            tokenizer=ShingleTokenizer(n=3),
        ).select("l_id", "r_id")
        groups = dedup_groups(docs, "url", pairs)
        rep = groups.groupBy("group_id").agg(F.min("id").alias("_rep"))
        keep = groups.join(rep, "group_id").where(F.col("id") == F.col("_rep"))
        kept = docs.join(
            keep.select(F.col("id").alias("url")), "url", "left_semi"
        )
        return st.write(kept, fp, {"n_in": int(docs.count())})

    def hygiene(self) -> dict:
        st, fp = self._stage("03_hygiene")
        if st.done(fp):
            return st.manifest()
        docs = Stage(self.workdir, "02_neardup").read(self.spark)
        sited = docs.withColumn("_site", url_host_expr(F.col("url")))
        clean = remove_boilerplate_lines(
            sited, "url", "text", "_site",
            min_pages=self.boilerplate_min_pages,
        ).select("url", F.col("clean_text"))
        merged = docs.drop("text").join(clean, "url")
        gate = gopher_quality_filter(
            merged, "url", "clean_text",
            min_words=self.min_words, max_words=self.max_words,
        ).select("url", "keep", "reason")
        reasons = {
            r["reason"]: int(r["n"])
            for r in gate.where(~F.col("keep"))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        kept = merged.join(
            gate.where(F.col("keep")).select("url"), "url", "left_semi"
        ).withColumnRenamed("clean_text", "text")
        return st.write(kept, fp, {"n_in": int(docs.count()), "dropped_by_rule": reasons})

    def scrub(self) -> dict:
        st, fp = self._stage("04_scrub")
        if st.done(fp):
            return st.manifest()
        docs = Stage(self.workdir, "03_hygiene").read(self.spark)
        out = docs.withColumn("text", redact_pii_expr(F.col("text")))
        return st.write(out, fp)

    def splits(self) -> dict:
        st, fp = self._stage("05_splits")
        if st.done(fp):
            return st.manifest()
        docs = Stage(self.workdir, "04_scrub").read(self.spark)
        out = assign_splits(
            docs, "url", self.split_weights, seed=self.split_seed
        )
        return st.write(out, fp)

    # ------------------------------------------------------------------ run
    def run(self, pages: DataFrame) -> DataFrame:
        self.canon(pages)
        self.neardup()
        self.hygiene()
        self.scrub()
        self.splits()
        return Stage(self.workdir, "05_splits").read(self.spark)

    def metrics(self) -> dict:
        out = {}
        for name in ("01_canon", "02_neardup", "03_hygiene", "04_scrub", "05_splits"):
            st = Stage(self.workdir, name)
            if os.path.exists(st.manifest_path):
                m = st.manifest()
                out[name] = {
                    k: m[k]
                    for k in ("n_rows", "n_in", "wall_sec", "dropped_by_rule")
                    if k in m
                }
        return out
