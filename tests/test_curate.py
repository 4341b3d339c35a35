"""Curation chain (VERDICT r4 #1): one flagged frame, disjoint per-filter
drop reasons, resumable `curate` pipeline stage with lineage metrics.

Model: the reference chains its post-scan stages in one orchestrated DAG
(wdq0.pl:188-220); here the chain is dedup -> quality -> repetition ->
near-dup -> quota with first-failing-filter attribution.
"""

import json
import os

from pyspark.sql import functions as F

from wikidata_dump_processor_spark.operators.curate import (
    curate_documents,
    curated_only,
    curation_audit,
)


def _good_text(i: int) -> str:
    # ~120 tokens, high stopword ratio, no punctuation, no repeated
    # lines/bigrams: passes every gate
    return " ".join(
        f"the alpha{i}x{j} beta{j} of gamma{j} is delta{i}y{j}"
        for j in range(15)
    )


def _docs(spark):
    near = " ".join(f"the common{j} words of this is shared{j}" for j in range(15))
    rows = [
        # (url, text) — expected drop reason in comments
        ("https://ex.example/a", _good_text(1)),                    # kept
        ("https://ex.example/a?utm_source=x", _good_text(1)),       # url_dup
        ("https://zz.example/copy", _good_text(1)),                 # exact_dup
        ("https://ex.example/b", "!!! ??? ### 123"),                # quality
        ("https://ex.example/c",
         "\n".join(["the spam line of text is here"] * 20)),        # repetition
        ("https://nd.example/d1", near + " ending-one"),            # kept
        ("https://nd.example/d2", near + " ending-two"),            # near_dup
        ("https://ok.example/e", _good_text(2)),                    # kept
    ]
    return spark.createDataFrame(
        [(u, None, "en", t) for u, t in rows],
        "url string, warc_ts timestamp, lang string, text string",
    )


def test_curate_documents_reasons_golden(spark):
    flagged = curate_documents(_docs(spark))
    got = {r.url: r._drop_reason for r in flagged.collect()}
    assert got == {
        "https://ex.example/a": None,
        "https://ex.example/a?utm_source=x": "url_dup",
        "https://zz.example/copy": "exact_dup",
        "https://ex.example/b": "quality",
        "https://ex.example/c": "repetition",
        "https://nd.example/d1": None,
        "https://nd.example/d2": "near_dup",
        "https://ok.example/e": None,
    }
    audit = curation_audit(flagged)
    assert audit["kept"] == 3 and audit["input_rows"] == 8
    assert audit["dropped"] == {
        "url_dup": 1, "exact_dup": 1, "quality": 1,
        "repetition": 1, "near_dup": 1,
    }
    kept = curated_only(flagged)
    assert kept.count() == 3 and "_drop_reason" not in kept.columns
    # curated snapshot is self-describing: features + canonical key ride along
    assert {"canonical_url", "canonical_url_key", "fp_md5", "quality",
            "dup_line_frac", "top_bigram_frac"} <= set(kept.columns)


def test_curate_domain_quota_deterministic(spark):
    head = [
        (f"https://head.example/p{i}", _good_text(100 + i)) for i in range(40)
    ]
    tail = [(f"https://tail.example/q{i}", _good_text(500 + i)) for i in range(3)]
    df = spark.createDataFrame(
        [(u, None, "en", t) for u, t in head + tail],
        "url string, warc_ts timestamp, lang string, text string",
    )
    flagged = curate_documents(df, near_dup=False, domain_cap=10)
    audit = curation_audit(flagged)
    assert audit["input_rows"] == 43
    assert audit["dropped"].keys() == {"domain_quota"}
    # tail domain is under cap: untouched; head reduced toward the cap
    kept_urls = {r.url for r in curated_only(flagged).collect()}
    assert all(u in kept_urls for u, _ in tail)
    assert 3 < len(kept_urls) < 43
    # hash-Bernoulli selection is deterministic across runs
    again = {r.url for r in curated_only(curate_documents(
        df, near_dup=False, domain_cap=10)).collect()}
    assert again == kept_urls


def test_pipeline_curate_stage_resume(spark, tmp_path):
    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.plans.pipeline import MANIFEST, run_pipeline

    out = str(tmp_path / "curated_pipe")
    opts = dict(
        quality_min=0.0, max_dup_line_frac=1.0, max_top_bigram_frac=1.0,
        minhash_threshold=0.95,
    )
    kw = dict(fingerprint="n=120", curate=True, curate_opts=opts)
    res = run_pipeline(
        spark, datagen.gen_pages(spark, 120), datagen.gen_aliases(spark),
        out, datagen.gen_entity_catalog(spark), **kw,
    )
    assert os.path.isdir(os.path.join(out, "docs_curated"))
    man = json.load(open(os.path.join(out, MANIFEST)))
    assert man["curate"]["state"] == "committed"
    filt = man["curate"]["metrics"]["filters"]
    n_in = filt["input_rows"]
    assert n_in > 0
    assert filt["kept"] + sum(filt["dropped"].values()) == n_in
    assert res["docs_curated"].count() == filt["kept"]
    # resume: same fingerprint skips the stage (snapshot read back)
    before = man["curate"]["committed_at"]
    res2 = run_pipeline(
        spark, datagen.gen_pages(spark, 120), datagen.gen_aliases(spark),
        out, datagen.gen_entity_catalog(spark), **kw,
    )
    man2 = json.load(open(os.path.join(out, MANIFEST)))
    assert man2["curate"]["committed_at"] == before
    assert res2["docs_curated"].count() == filt["kept"]
    # partial resume THROUGH the stage: drop curate from the manifest,
    # re-run -> only curate recomputes
    import shutil

    shutil.rmtree(os.path.join(out, "docs_curated"))
    man2.pop("curate")
    json.dump(man2, open(os.path.join(out, MANIFEST), "w"))
    res3 = run_pipeline(
        spark, datagen.gen_pages(spark, 120), datagen.gen_aliases(spark),
        out, datagen.gen_entity_catalog(spark), **kw,
    )
    man3 = json.load(open(os.path.join(out, MANIFEST)))
    assert man3["curate"]["state"] == "committed"
    assert man3["extract"]["committed_at"] == man["extract"]["committed_at"]
    assert res3["docs_curated"].count() == filt["kept"]


def test_pipeline_curate_pii_manifest_metrics(spark, tmp_path):
    """pii_redact=True surfaces the PII audit in the curate stage's
    manifest metrics (matches/docs per type over the kept corpus)."""
    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "kg")
    res = run_pipeline(
        spark, datagen.gen_pages(spark, 40).localCheckpoint(eager=True),
        datagen.gen_aliases(spark), out, fingerprint="pii-m",
        curate=True, curate_opts={"pii_redact": True, "near_dup": False},
    )
    m = res["manifest"].stages["curate"]["metrics"]
    assert "pii" in m and "any" in m["pii"]
    assert set(m["pii"]["any"]) == {"matches", "docs"}
    # the audit is over the KEPT corpus: docs bound by kept count
    assert m["pii"]["any"]["docs"] <= m["filters"]["kept"]
    cur = spark.read.parquet(os.path.join(out, "docs_curated"))
    assert "text_redacted" in cur.columns
