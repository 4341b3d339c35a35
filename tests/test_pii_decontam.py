"""Golden tests for the PII scrubber and the benchmark-decontamination
operator — both oracle-checked against independent pure-Python
re-derivations (the same strategy as the repetition/canonical-url
goldens; no driver slot, see the 50-query-cap note in
queries_catalog.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from wikidata_dump_processor_spark.operators import decontam as DC
from wikidata_dump_processor_spark.operators import pii as P


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

_PII_DOCS = [
    "Contact me at jane.doe+spam@example.co.uk or on 212-555-0187.",
    "Server 192.168.0.1 and 10.0.0.255 but not 999.1.1.1 ok",
    "SSN 123-45-6789 card 4111 1111 1111 1111 done",
    "call +1 (415) 555-2671 now; backup (303) 555.0123",
    "no pii here at all, just words and numbers like 12345",
    "two mails: a@b.io c.d@e-f.org and ip 8.8.8.8",
    "card glued 4111-1111-1111-1111 and bare 4242424242424242",
    "almost-ssn 1234-45-6789 should not match; 987-65-4321 should",
    "",
    "edge 1.2.3.4.5 is not an ipv4; 255.255.255.255 is",
]


def _python_progressive(text: str):
    """Independent oracle: the SAME pattern strings through Python re,
    with the SAME progressive order (count on redacted-so-far text)."""
    counts = {}
    t = text
    for name, (pat, repl) in P.PII_PATTERNS.items():
        counts[name] = len(re.findall(pat, t))
        t = re.sub(pat, repl, t)
    return counts, t


def test_pii_counts_and_redaction_golden(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_PII_DOCS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in P.redact_pii(P.pii_counts(docs)).collect()
    }
    assert len(got) == len(_PII_DOCS)
    for i, text in enumerate(_PII_DOCS):
        counts, redacted = _python_progressive(text)
        for name in P.PII_PATTERNS:
            assert got[i][f"pii_{name}_count"] == counts[name], (i, name, text)
        assert got[i].pii_total_count == sum(counts.values())
        assert got[i].text_redacted == redacted, (i, text)
    # the planted values really get scrubbed
    joined = " ".join(r.text_redacted for r in got.values())
    for needle in ("jane.doe", "192.168.0.1", "123-45-6789", "4111", "555-2671"):
        assert needle not in joined
    assert "<EMAIL>" in joined and "<CARD>" in joined and "<PHONE>" in joined


def test_pii_specificity(spark):
    """Attribution is one-type-per-match: a card number is credit_card
    (not 2 phones), an SSN is ssn (not a phone fragment), and redaction
    honors the type subset."""
    docs = spark.createDataFrame(
        [(1, "4111 1111 1111 1111 and 123-45-6789")], "doc_id long, text string"
    )
    r = P.pii_counts(docs).collect()[0]
    assert r.pii_credit_card_count == 1
    assert r.pii_ssn_count == 1
    assert r.pii_phone_count == 0
    only_ssn = P.redact_pii(docs, types=["ssn"]).collect()[0].text_redacted
    assert "<SSN>" in only_ssn and "4111" in only_ssn
    with pytest.raises(ValueError, match="unknown PII types"):
        P.redact_pii(docs, types=["passport"])


def test_pii_report_bounded(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_PII_DOCS)], "doc_id long, text string"
    )
    rep = {r.pii_type: r for r in P.pii_report(docs).collect()}
    assert set(rep) == set(P.PII_PATTERNS) | {"any"}
    exp = [_python_progressive(t)[0] for t in _PII_DOCS]
    assert rep["email"].matches == sum(c["email"] for c in exp)
    assert rep["any"].docs == sum(1 for c in exp if sum(c.values()) > 0)
    assert rep["any"].total_docs == len(_PII_DOCS)


def test_pii_plan_is_codegen(spark):
    """100-TB gate: the whole PII pass is JVM expressions — no Python
    evaluation node anywhere in the plan."""
    docs = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = (
        P.redact_pii(P.pii_counts(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _py_norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = _py_norm_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


_BENCH_ITEMS = [
    "What is the capital of France? The capital of France is Paris, a city on the Seine.",
    "Solve for x: two x plus three equals eleven so x equals four exactly here.",
    "short item",  # < n tokens at n=8: contributes nothing
]

_CORPUS = [
    (0, "Totally clean document about spark pipelines and parquet files at scale."),
    # verbatim benchmark sentence embedded mid-document (punct/case differ)
    (1, "Trivia corner!! the CAPITAL of france IS paris, a City on the seine -- enjoy."),
    (2, "Discusses that two x plus three equals eleven so x equals four exactly here, leaked."),
    (3, "Contains the words capital France Paris but never eight in a row from the item."),
    (4, "short item"),  # matches a short benchmark item: must NOT flag at n=8
    (5, ""),
]


@pytest.mark.parametrize("n", [8, 5])
def test_decontamination_golden(spark, n):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(t,) for t in _BENCH_ITEMS], "text string"
    )
    # independent oracle: python set overlap on string n-grams
    bench_grams = set().union(*(_py_ngrams(t, n) for t in _BENCH_ITEMS))
    exp = {
        i: len([g for g in _ngram_list(t, n) if g in bench_grams])
        for i, t in _CORPUS
    }
    exp = {i: c for i, c in exp.items() if c > 0}

    got = {
        r.doc_id: r.contaminated_grams
        for r in DC.contamination_counts(docs, bench, n=n).collect()
    }
    assert got == exp
    clean = {r.doc_id for r in DC.decontaminate(docs, bench, n=n).collect()}
    assert clean == {i for i, _ in _CORPUS} - set(exp)


def _ngram_list(text: str, n: int) -> list[str]:
    toks = _py_norm_tokens(text)
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_decontamination_plan_broadcasts_benchmark(spark):
    """100-TB gate: the gram join must be a broadcast LEFT SEMI (the
    corpus side is never shuffled to find matches) and gram generation
    is pure JVM."""
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame([(t,) for t in _BENCH_ITEMS], "text string")
    plan = (
        DC.contamination_counts(docs, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# curation-chain integration
# ---------------------------------------------------------------------------


def test_curate_chain_decontam_and_pii(spark):
    """The curation chain accepts a benchmark (drop reason
    'contaminated', attributed after repetition and before near_dup) and
    pii_redact=True (text_redacted transform, no drop-count effect)."""
    from wikidata_dump_processor_spark.operators.curate import (
        curate_documents,
        curation_audit,
    )

    def good(i):
        return " ".join(
            f"the alpha{i}x{j} beta{j} of gamma{j} is delta{i}y{j}"
            for j in range(15)
        )

    leak = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        ("https://ok.example/a", good(1) + " mail me a@b.co"),       # kept
        ("https://ok.example/b", good(2) + " " + leak),              # contaminated
        ("https://ok.example/c", "!!! ??? ###"),                     # quality
    ]
    docs = spark.createDataFrame(
        [(u, None, "en", t) for u, t in rows],
        "url string, warc_ts timestamp, lang string, text string",
    )
    bench = spark.createDataFrame([(leak,)], "text string")
    flagged = curate_documents(
        docs, benchmark=bench, decontam_ngram=6, pii_redact=True,
    )
    got = {r.url: r for r in flagged.collect()}
    assert got["https://ok.example/a"]._drop_reason is None
    assert got["https://ok.example/b"]._drop_reason == "contaminated"
    assert got["https://ok.example/c"]._drop_reason == "quality"
    # pii redaction is a transform on the flagged frame, all rows
    assert got["https://ok.example/a"].text_redacted.endswith("<EMAIL>")
    assert "a@b.co" not in got["https://ok.example/a"].text_redacted
    audit = curation_audit(flagged)
    assert audit["dropped"] == {"contaminated": 1, "quality": 1}
    assert audit["kept"] == 1


# ---------------------------------------------------------------------------
# paragraph-level dedup
# ---------------------------------------------------------------------------


def _py_para_dedup(corpus, mode, min_count=2, min_para_chars=20):
    """Independent oracle: same semantics in plain Python."""
    def paras(t):
        return [p.strip() for p in re.split(r"\n{2,}", t) if p.strip()]

    def norm(p):
        return re.sub(r"\s+", " ", p.lower()).strip()

    occ = []  # (doc_id, idx, norm) for eligible paragraphs, doc order
    for i, t in corpus:
        for j, p in enumerate(paras(t)):
            if len(p) >= min_para_chars:
                occ.append((i, j, norm(p)))
    from collections import Counter

    cnt = Counter(n for _, _, n in occ)
    drop = set()
    if mode == "drop_frequent":
        drop = {(i, j) for i, j, n in occ if cnt[n] >= min_count}
    else:  # keep_first in (id, idx) order
        seen = set()
        for i, j, n in sorted(occ):
            if n in seen:
                drop.add((i, j))
            seen.add(n)
    out = {}
    for i, t in corpus:
        kept = [p for j, p in enumerate(paras(t)) if (i, j) not in drop]
        out[i] = ("\n\n".join(kept), sum(1 for j, _ in enumerate(paras(t)) if (i, j) in drop))
    return out


_BOILER = "This website uses cookies to improve your experience on our site."
_PARA_CORPUS = [
    (0, f"Unique intro paragraph about volcanic rocks and minerals.\n\n{_BOILER}\n\nMore unique geology content follows here."),
    (1, f"{_BOILER}\n\nAn entirely different essay on rivers and deltas in detail."),
    (2, f"Short\n\n{_BOILER}\n\nShort\n\nClosing thoughts that appear nowhere else at all."),
    (3, "A document with no duplicated paragraphs whatsoever, fully unique text."),
    (4, "   \n\n  "),  # whitespace-only -> zero paragraphs
    (5, f"Repeated-inside:\n\nSame inner paragraph appears twice in this one document.\n\nSame inner paragraph appears twice in this one document."),
]


@pytest.mark.parametrize("mode", ["drop_frequent", "keep_first"])
def test_paragraph_dedup_golden(spark, mode):
    from wikidata_dump_processor_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(_PARA_CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_para_dedup, r.n_paras_removed)
        for r in paragraph_dedup(docs, mode=mode).collect()
    }
    exp = _py_para_dedup(_PARA_CORPUS, mode)
    assert got == exp
    # the boilerplate paragraph really is gone from every doc in
    # drop_frequent mode, kept exactly once in keep_first mode
    joined = "\n\n".join(t for t, _ in got.values())
    if mode == "drop_frequent":
        assert _BOILER not in joined
    else:
        assert joined.count(_BOILER) == 1
    # 'Short' (< min_para_chars) is exempt despite appearing twice
    assert got[2][0].count("Short") == 2
    # in-doc repetition (corpus count 2): drop_frequent removes BOTH
    # copies (boilerplate semantics); keep_first keeps exactly one
    expected_copies = 0 if mode == "drop_frequent" else 1
    assert got[5][0].count("Same inner paragraph") == expected_copies


def test_paragraph_dedup_plan_shape(spark):
    """100-TB gate: drop_frequent is window-free (mega-key safe, partial
    agg) and the text column never reaches the drop-list aggregation."""
    from wikidata_dump_processor_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(_PARA_CORPUS, "doc_id long, text string")
    plan = (
        paragraph_dedup(docs, mode="drop_frequent")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    plan_kf = (
        paragraph_dedup(docs, mode="keep_first")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan_kf


def test_contamination_report_per_item(spark):
    """Per-item leak report: rows only for leaked items, with distinct
    leaked-doc counts and raw gram-hit counts matching the oracle."""
    n = 8
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_BENCH_ITEMS)], "item_id long, text string"
    )
    got = {
        r.bench_id: (r.leaked_docs, r.gram_hits)
        for r in DC.contamination_report(
            docs, bench, bench_id_col="item_id", n=n
        ).collect()
    }
    # oracle: for each item, the docs/gram-occurrence hits of its grams
    exp = {}
    for i, bt in enumerate(_BENCH_ITEMS):
        bg = _py_ngrams(bt, n)
        leaked, hits = set(), 0
        for d, t in _CORPUS:
            match = [g for g in _ngram_list(t, n) if g in bg]
            if match:
                leaked.add(d)
                hits += len(match)
        if leaked:
            exp[i] = (len(leaked), hits)
    assert got == exp and exp  # items 0 and 1 leak, the short item never


def test_pii_randomized_parity(spark):
    """Seeded randomized parity: 300 messy synthetic texts (vocab +
    planted/near-miss PII fragments) must produce IDENTICAL counts and
    redactions from the Spark JVM regex and the Python re oracle —
    guards the Java/Python pattern-subset claim beyond handpicked
    fixtures."""
    import random

    rng = random.Random(20260817)
    vocab = ["alpha", "beta", "contact", "12", "x9", "mail", ".", "-", "(", ")"]
    frags = [
        lambda: f"{rng.choice('abc')}@{rng.choice('de')}.{rng.choice(['io', 'org', 'c'])}",
        lambda: ".".join(str(rng.randint(0, 300)) for _ in range(rng.randint(3, 5))),
        lambda: "-".join(str(rng.randint(0, 9999)) for _ in range(rng.randint(2, 4))),
        lambda: f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}",
        lambda: " ".join(str(rng.randint(1000, 9999)) for _ in range(4)),
        lambda: f"+1 ({rng.randint(100, 999)}) {rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
        lambda: str(rng.randint(0, 10**rng.randint(1, 18))),
    ]
    texts = []
    for _ in range(300):
        parts = [
            frags[rng.randrange(len(frags))]() if rng.random() < 0.4
            else rng.choice(vocab)
            for _ in range(rng.randint(0, 25))
        ]
        texts.append(rng.choice(["", " "]).join(parts))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r for r in P.redact_pii(P.pii_counts(docs)).collect()
    }
    for i, text in enumerate(texts):
        counts, redacted = _python_progressive(text)
        for name in P.PII_PATTERNS:
            assert got[i][f"pii_{name}_count"] == counts[name], (i, name, repr(text))
        assert got[i].text_redacted == redacted, (i, repr(text))


def test_curate_chain_para_dedup_prepass(spark):
    """para_dedup=True strips corpus-wide boilerplate BEFORE the filter
    chain (drop_frequent: any paragraph shared by >= 2 docs goes), the
    original text survives in text_orig, and downstream filters judge
    the stripped text — a boilerplate-only doc becomes empty and falls
    to the quality gate."""
    from wikidata_dump_processor_spark.operators.curate import (
        curate_documents,
        curation_audit,
    )

    def body(tag):
        return " ".join(
            f"the {tag}{j} word{j} of thing{tag}{j} is value{tag}{j}"
            for j in range(15)
        )

    boiler = "This website uses cookies to improve your experience on our site."
    rows = [
        ("https://a.example/1", f"{body('a')}\n\n{boiler}"),
        ("https://b.example/2", f"{boiler}\n\n{body('b')}"),
        ("https://c.example/3", f"{body('c')}"),
        ("https://d.example/4", boiler),  # boilerplate-only -> empty
    ]
    docs = spark.createDataFrame(
        [(u, None, "en", t) for u, t in rows],
        "url string, warc_ts timestamp, lang string, text string",
    )
    flagged = curate_documents(docs, near_dup=False, para_dedup=True)
    got = {r.url: r for r in flagged.collect()}
    for u, orig in rows:
        assert boiler not in (got[u].text or "")
        assert got[u].text_orig == orig
    assert got["https://a.example/1"].n_paras_removed == 1
    assert got["https://b.example/2"].n_paras_removed == 1
    assert got["https://c.example/3"].n_paras_removed == 0
    # unique bodies survive every gate; the emptied doc falls to quality
    assert got["https://a.example/1"]._drop_reason is None
    assert got["https://b.example/2"]._drop_reason is None
    assert got["https://c.example/3"]._drop_reason is None
    assert got["https://d.example/4"]._drop_reason == "quality"
    assert curation_audit(flagged)["dropped"] == {"quality": 1}


@pytest.mark.parametrize("mode", ["drop_frequent", "keep_first"])
def test_paragraph_dedup_randomized_parity(spark, mode):
    """Seeded randomized parity for paragraph dedup: 120 docs built from
    a small paragraph pool (forcing cross-doc collisions, short-para
    exemptions, empty docs) must match the Python oracle exactly in both
    modes."""
    import random

    rng = random.Random(20260818)
    pool = [
        f"shared paragraph number {i} with enough characters to count here"
        for i in range(12)
    ] + ["tiny", "also-tiny"]  # below min_para_chars: exempt

    def make_doc(i):
        k = rng.randint(0, 6)
        paras = [rng.choice(pool) for _ in range(k)]
        if rng.random() < 0.5:
            paras.append(f"unique paragraph for document {i} padded to length")
        rng.shuffle(paras)
        return "\n\n".join(paras)

    corpus = [(i, make_doc(i)) for i in range(120)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    from wikidata_dump_processor_spark.operators.dedup import paragraph_dedup

    got = {
        r.doc_id: (r.text_para_dedup, r.n_paras_removed)
        for r in paragraph_dedup(docs, mode=mode).collect()
    }
    exp = _py_para_dedup(corpus, mode)
    assert got == exp
