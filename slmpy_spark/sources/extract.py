"""Deterministic, dependency-free HTML text & link extraction.

The north-rule invariant is **byte-identical extracted text per url**
(BASELINE.json input_hint), so these are frozen pure functions over
``bytes`` — no bs4/lxml/chardet whose behavior drifts across versions
(SURVEY.md §8-H4).  Pinned extraction spec v1:

text extraction (``extract_text``):
  1. drop <script>/<style> elements including content (case-insensitive,
     non-greedy to the matching close tag);
  2. drop HTML comments ``<!-- ... -->``;
  3. replace every remaining tag ``<...>`` with a single space;
  4. decode exactly these entities: &amp; &lt; &gt; &quot; &#39; &apos;
     &nbsp; (+ numeric &#NNN; / &#xHH; for NNN < 0x110000);
  5. collapse all whitespace runs to one ASCII space; strip ends;
  6. output is UTF-8 (input decoded as UTF-8 with errors="replace").

link extraction (``extract_links``):
  - script/style elements and comments stripped first (an href inside
    a JS string is not a link);
  - every ``<a ... href="...">`` occurrence, in document order, with
    duplicates preserved (edge weight = link multiplicity);
  - href resolved against the page url (RFC 3986 via urllib.parse);
  - fragments stripped; only http/https kept; self-links dropped.
"""

from __future__ import annotations

import re
from urllib.parse import urldefrag, urljoin, urlsplit, urlunsplit

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_NUMERIC_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_HREF_RE = re.compile(
    r"""(?is)<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
)

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; → &lt; (literal), not <
)


def _decode_entities(s: str) -> str:
    def num(m: re.Match) -> str:
        v = m.group(1)
        cp = int(v[1:], 16) if v[0] in "xX" else int(v)
        return chr(cp) if 0 <= cp < 0x110000 else m.group(0)

    s = _NUMERIC_ENT_RE.sub(num, s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def extract_text(html: bytes) -> str:
    """Frozen text extraction, spec v1 above. bytes → str (UTF-8)."""
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _decode_entities(s)
    return _WS_RE.sub(" ", s).strip()


def extract_text_series(html):
    """Batch variant of `extract_text` over a pandas Series of binary
    payloads — identical spec v1 passes applied with pandas `.str`
    (same compiled regexes → byte-identical output), one pass per rule
    over the whole Arrow batch instead of a per-page Python call.
    None payloads yield ''."""
    import pandas as pd

    s = pd.Series(
        [b"" if h is None else bytes(h) for h in html], index=html.index
    ).str.decode("utf-8", errors="replace")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)

    def num(m: re.Match) -> str:
        v = m.group(1)
        cp = int(v[1:], 16) if v[0] in "xX" else int(v)
        return chr(cp) if 0 <= cp < 0x110000 else m.group(0)

    s = s.str.replace(_NUMERIC_ENT_RE, num, regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s.str.replace(_WS_RE, " ", regex=True).str.strip()


def normalize_url(url: str) -> str | None:
    """Lowercase scheme+host, strip fragment and default port; None for
    non-http(s)."""
    url, _ = urldefrag(url)
    parts = urlsplit(url)
    if parts.scheme.lower() not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if netloc.endswith(":80") and parts.scheme.lower() == "http":
        netloc = netloc[:-3]
    if netloc.endswith(":443") and parts.scheme.lower() == "https":
        netloc = netloc[:-4]
    return urlunsplit((parts.scheme.lower(), netloc, parts.path, parts.query, ""))


def extract_links_frame(urls, htmls):
    """Batch variant of `extract_links` over pandas Series (url, html):
    the script/comment strip and the href scan run batch-wise
    (`.str.replace` / `.str.extractall` — one C-loop pass per rule);
    only RFC 3986 resolution + normalization stay per-HREF Python (no
    vectorized equivalent exists).  Returns a DataFrame (url, link)
    with the same multiset of pairs as per-page `extract_links`."""
    import pandas as pd

    s = pd.Series(
        [b"" if h is None else bytes(h) for h in htmls], index=htmls.index
    ).str.decode("utf-8", errors="replace")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    hits = s.str.extractall(_HREF_RE)
    out_u: list[str] = []
    out_l: list[str] = []
    if hits.empty:
        return pd.DataFrame({"url": out_u, "link": out_l})
    # final .fillna(""): an empty href (<a href="">) leaves NaN in all
    # three capture columns, and str(NaN) would fabricate a 'nan' link —
    # the empty string instead hits the `if not href: continue` guard,
    # matching per-page extract_links exactly
    href_raw = hits[1].fillna(hits[2]).fillna(hits[3]).fillna("")
    base_for = urls.reindex(hits.index.get_level_values(0))
    self_norm_cache: dict[str, str | None] = {}
    for base, href in zip(base_for.to_numpy(), href_raw.to_numpy()):
        href = _decode_entities(str(href).strip())
        if not href:
            continue
        norm = normalize_url(urljoin(base, href))
        if base not in self_norm_cache:
            self_norm_cache[base] = normalize_url(base)
        if norm is None or norm == self_norm_cache[base]:
            continue
        out_u.append(base)
        out_l.append(norm)
    return pd.DataFrame({"url": out_u, "link": out_l})


def extract_links(html: bytes, base_url: str) -> list[str]:
    """All outlink urls of a page, document order, duplicates kept,
    self-links dropped, normalized per `normalize_url`."""
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    self_norm = normalize_url(base_url)
    out: list[str] = []
    for m in _HREF_RE.finditer(s):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        href = _decode_entities(href.strip())
        if not href:
            continue
        resolved = urljoin(base_url, href)
        norm = normalize_url(resolved)
        if norm is None or norm == self_norm:
            continue
        out.append(norm)
    return out
