"""Golden oracle: straight-line Python re-derivation of the reference's
per-record semantics (wdq1.pl:468-784), used ONLY by tests to compute the
expected triple set / item rows for the P/R >= 0.95 gate.

Deliberately written as a naive per-record loop mirroring the Perl control
flow — it shares no code with the Spark operators, so agreement between the
two is a real check.
"""

from __future__ import annotations

import json
import re

from .schemas import FILTER_BANK, LANGS, RAW_MENTION_PATTERNS

_MENTION_RES = {p: re.compile(pat, re.IGNORECASE) for p, pat in RAW_MENTION_PATTERNS.items()}


def _canon_nums(x):
    """Integral floats render without the trailing '.0' — matching both
    Perl's decode/encode_json numeric round-trip (an NV 40.0 re-encodes as
    40) and Spark VARIANT's to_json; Python's json.dumps alone would emit
    '40.0' and break byte-level agreement on JSON-encoded struct values."""
    if isinstance(x, dict):
        return {k: _canon_nums(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_canon_nums(v) for v in x]
    if isinstance(x, float) and x.is_integer():
        return int(x)
    return x


def json_encode_value(x) -> str:
    """Filter.pm:98-101 encode_json fallback, canonical form."""
    return json.dumps(_canon_nums(x), separators=(",", ":"), sort_keys=True)


def _extract(x, transform: int):
    """Filter.pm:76-108 _extract."""
    if transform == 1 and isinstance(x, dict):
        et = x.get("entity-type")
        prefix = {"item": "Q", "property": "P"}.get(et)  # no lexeme branch
        return f"{prefix}{x['numeric-id']}" if prefix is not None else None
    if isinstance(x, dict):
        return json_encode_value(x)
    return x


def golden_record(raw_line: str):
    """Process one serialized record exactly like the wdq1.pl main loop.

    Returns (triples, item_row, diag):
    * triples: list of (subj, pred, obj) for filter-bank props + raw
      mention scans
    * item_row: dict with id/type/label/lang/all_properties or None
    * diag: reason string when the record is skipped
    """
    line = raw_line.strip()
    if line in ("[", "]", ""):
        return [], None, "bracket"
    if line.endswith(","):
        line = line[:-1]
    try:
        j = json.loads(line)
    except Exception:
        return [], None, "json parse error"
    if not isinstance(j, dict):
        return [], None, "json parse error"
    eid, ty = j.get("id"), j.get("type")
    if eid is None:
        return [], None, "json parse error"
    if re.match(r"^P\d+$", str(eid)):
        return [], {"id": eid, "type": "property", "def": j}, None
    m = re.match(r"^[QL](\d+)$", str(eid))
    if m is None:
        return [], None, f"bad id: {eid}"
    if ty not in ("item", "lexeme"):
        return [], None, f"unknown type: {ty}"

    triples = []
    # raw-record mention scan (wdq1.pl:636-653) — BEFORE the claim loop
    for pred, rx in _MENTION_RES.items():
        mm = rx.search(line)
        if mm:
            y = mm.group(1).replace("\\", "")
            triples.append((eid, pred, y))

    jc = j.get("claims") or {}
    for prop in sorted(jc.keys()):  # sort keys %$jc (wdq1.pl:593)
        if not re.match(r"^P\d+$", prop):
            continue  # warn+skip (wdq1.pl:662-667)
        arr = jc[prop]
        try:
            ms = arr[0]["mainsnak"]
        except Exception:
            continue
        if ms.get("snaktype") != "value":
            continue  # diag (wdq1.pl:683-689)
        try:
            x = ms["datavalue"]["value"]
        except Exception:
            continue
        if x is None:
            continue
        if prop in FILTER_BANK:
            y = _extract(x, FILTER_BANK[prop][1])
            triples.append((eid, prop, y))

    # preferred label (wdq1.pl:565-588)
    jl, jle = j.get("labels") or {}, j.get("lemmas")
    x_langs = list(LANGS) + (list(jle.keys()) if jle is not None else [])
    src = jle if jle is not None else jl
    pref_l, lang_l = None, None
    for lang in x_langs:
        label = (src.get(lang) or {}).get("value")
        if pref_l is None:
            pref_l, lang_l = label, lang
    item_row = {
        "id": eid,
        "type": ty,
        "label": pref_l,
        "lang": lang_l,
        "all_properties": sorted(jc.keys()),
    }
    return triples, item_row, None


def golden_triples_for_pages(n: int) -> set[tuple[str, str, str | None]]:
    """Expected triple set over the synthetic corpus of n pages."""
    from .datagen import expected_text

    out: set[tuple[str, str, str | None]] = set()
    for i in range(n):
        text = expected_text(i)
        if not text:
            continue
        first_line = text.split("\n", 1)[0]
        triples, _, _ = golden_record(first_line)
        out.update(triples)
    return out
