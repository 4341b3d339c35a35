"""S5: remote dump discovery + fetch (wdq0.pl:234-293, wdq_fetcher.pl:80-144).

The reference scrapes an Apache-style index page, filters rows through
size sanity gates (dummy files <= 100 B; lexeme dumps 300 MB-1 GB; full
dumps >= 100 GB), fetches missing files with wget, and re-checks the
fetched size against the advertised one.  Here the same semantics are
driver-side pure functions with an injectable ``fetcher`` (the sandbox
has no network; production passes urllib/wget/boto).  Idempotence =
skip-if-exists (wdq0.pl:244); completeness = the St6 gate semantics
(wdq0.pl:163-181).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

from ..plans.pipeline import IncompleteInputError

# wdq0.pl:274: index rows look like
#   <a href="20201019.json.gz">20201019.json.gz</a>  19-Oct-2020 09:12  89827998242
INDEX_ROW_RE = re.compile(
    r'<a href="((\d{4})(\d{2})(\d{2})\.json\.gz)">(\d{8}\.json\.gz)</a>'
    r"\s+(\S+)\s+(\S+)\s+(\d+)"
)

DUMMY_MAX_BYTES = 100  # wdq0.pl:277: "dummy files have 63 or 67 bytes"
LEXEME_RANGE = (300_000_000, 1_000_000_000)  # wdq0.pl:279
FULL_MIN = 100_000_000_000  # wdq0.pl:280


def parse_dump_index(html: str) -> list[dict]:
    """Every dump row on the index page: {dump_file, date, size}."""
    out = []
    for m in INDEX_ROW_RE.finditer(html):
        f1, year, mon, day, _f2, _xdate, _time, size = m.groups()
        out.append(
            {"dump_file": f1, "date": f"{year}-{mon}-{day}", "size": int(size)}
        )
    return out


def discover_dumps(html: str) -> list[dict]:
    """wdq0.pl check_data_dump (:264-293): index rows surviving the size
    sanity gates — plausibly-complete lexeme or full dumps only."""
    res = []
    for rec in parse_dump_index(html):
        size = rec["size"]
        if size <= DUMMY_MAX_BYTES:
            continue
        if not (LEXEME_RANGE[0] <= size <= LEXEME_RANGE[1] or size >= FULL_MIN):
            continue
        res.append(rec)
    return res


def plan_fetch(rec: dict, dumps_dir: str, source_url: str) -> dict:
    """Idempotence guard (wdq0.pl:244-252): an existing local file is
    never re-fetched.  Returns {action: 'skip'|'fetch', path, url}."""
    path = os.path.join(dumps_dir, rec["dump_file"])
    action = "skip" if os.path.exists(path) else "fetch"
    return {"action": action, "path": path, "url": source_url + rec["dump_file"]}


def verify_fetched(rec: dict, path: str) -> int:
    """St6 size-vs-expected check after a fetch (wdq0.pl:163-181):
    smaller than advertised -> still in progress (skip this run); larger
    -> hard error.  Returns the verified size."""
    fetched = os.stat(path).st_size if os.path.exists(path) else 0
    if fetched < rec["size"]:
        raise IncompleteInputError(
            f"{path} is {fetched} B < advertised {rec['size']} B — "
            "download in progress? skipping (wdq0.pl:163-177)"
        )
    if fetched > rec["size"]:
        raise IncompleteInputError(
            f"{path} is {fetched} B > advertised {rec['size']} B (wdq0.pl:170-176)"
        )
    return fetched


def fetch_dumps(
    html: str,
    dumps_dir: str,
    source_url: str,
    fetcher: Callable[[str, str], None] | None = None,
) -> list[dict]:
    """Discovery -> plan -> fetch-if-missing -> verify, for every gated
    index row.  ``fetcher(url, dest_path)`` does the transfer (wget/urllib
    in production; tests inject a fake).  Returns the plans, each with
    ``verified_size`` filled in; an incomplete fetch raises."""
    if fetcher is None:  # pragma: no cover - needs network
        import urllib.request

        def fetcher(url: str, dest: str) -> None:
            urllib.request.urlretrieve(url, dest)

    os.makedirs(dumps_dir, exist_ok=True)
    out = []
    for rec in discover_dumps(html):
        plan = plan_fetch(rec, dumps_dir, source_url)
        if plan["action"] == "fetch":
            fetcher(plan["url"], plan["path"])
        plan["verified_size"] = verify_fetched(rec, plan["path"])
        out.append({**rec, **plan})
    return out
