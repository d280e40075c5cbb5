"""URL / title normalization — pure functions + vectorized Spark wrappers.

Semantics replicate the reference bit-for-bit (parity targets, tested against
a live import of the reference in tests/test_parity_functions.py):

- ``normalize_url``        — reference app/models.py:57-103
- YouTube canonicalization — reference app/models.py:105-203
- ``normalize_title``      — reference app/models.py:12-54
- ``url_search_variants``  — reference app/models.py:206-333 (compat only;
  the batch engine replaces search variants with a single norm_url join key)
- field validity           — reference app/hash_detector.py:156-165 and
  app/wlo_client.py:222-235

``resolve_url_redirect`` (app/models.py:336-397) is deliberately excluded:
per-row network I/O is non-deterministic and the corpus pipeline takes
``redirect_url`` as an optional input column instead.

The pure functions run identically on the driver (single-node oracle) and
inside Arrow-batched pandas UDFs on executors, so engine output is equal to
the oracle by construction.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlparse

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# --- title normalization -----------------------------------------------------

# Suffix-strip patterns, applied in order, case-insensitively
# (reference app/models.py:34-38; the pattern *text* must match exactly for
# parity — it is semantic configuration, not code).
_TITLE_SUFFIX_PATTERNS = [
    re.compile(
        r'\s*[-–—|:]\s*(?:Wikipedia|Klexikon|Wikibooks|Wikiversity|planet-schule'
        r'|Planet Schule|Lehrer-Online|Lernhelfer|sofatutor|learningapps'
        r'|serlo)[^\n]{0,200}$',
        re.IGNORECASE,
    ),
    re.compile(r'\s*\([^)\n]{0,100}\.(?:de|com|org|net|edu)\)$', re.IGNORECASE),
    re.compile(r'\s*\|\s*[^|\n]{0,100}$', re.IGNORECASE),
]

_TITLE_MAX = 1000


def normalize_title(title: str | None) -> str | None:
    """Strip publisher suffixes from a title (parity: app/models.py:12-54).

    Returns None when the input is empty/blank OR when normalization leaves
    the title unchanged (the reference signals "nothing gained" with None).
    """
    if not title or not title.strip():
        return None
    title = title.strip()
    if len(title) > _TITLE_MAX:
        title = title[:_TITLE_MAX]
    out = title
    for pat in _TITLE_SUFFIX_PATTERNS:
        out = pat.sub('', out)
    if not out or out == title:
        return None
    return out


# --- URL normalization --------------------------------------------------------

_YT_ID_PATTERNS = {
    "embed": re.compile(r'/embed/([a-zA-Z0-9_-]{11})'),
    "v": re.compile(r'/v/([a-zA-Z0-9_-]{11})'),
    "shorts": re.compile(r'/shorts/([a-zA-Z0-9_-]{11})'),
    "live": re.compile(r'/live/([a-zA-Z0-9_-]{11})'),
}
_YT_CHANNEL = re.compile(r'/channel/([a-zA-Z0-9_-]+)')
_YT_C = re.compile(r'/c/([^/]+)')
_YT_USER = re.compile(r'/user/([^/]+)')


def _youtube_video_id(host: str, path: str, query: dict) -> str | None:
    """Extract a video id using the reference's exact branch order
    (app/models.py:133-168). Branch order matters: a ``youtu.be`` link with
    an embed-looking path must take the youtu.be branch, etc."""
    if 'youtu.be' in host:
        vid = path.strip('/').split('/')[0]
        return vid.split('?')[0] if '?' in vid else vid
    if '/watch' in path and 'v' in query:
        return query['v'][0]
    for key in ("embed", "v", "shorts", "live"):
        token = f'/{key}/'
        if token in path:
            m = _YT_ID_PATTERNS[key].search(path)
            return m.group(1) if m else None
    return None


def _normalize_youtube(path: str, query_str: str, host: str) -> str | None:
    """Canonicalize YouTube URLs (parity: app/models.py:105-203).

    Videos -> youtube.com/watch?v=ID; playlists -> youtube.com/playlist?list=ID;
    channels -> youtube.com/@handle | /channel/ID | /c/NAME | /user/NAME;
    anything else -> youtube.com{path-without-trailing-slash}.
    """
    query = parse_qs(query_str)
    vid = _youtube_video_id(host, path, query)
    if vid and len(vid) == 11:
        return f"youtube.com/watch?v={vid}"
    if '/playlist' in path and 'list' in query:
        return f"youtube.com/playlist?list={query['list'][0]}"
    if path.startswith('/@'):
        handle = path[2:].split('/')[0]
        return f"youtube.com/@{handle}"
    if '/channel/' in path:
        m = _YT_CHANNEL.search(path)
        if m:
            return f"youtube.com/channel/{m.group(1)}"
    if '/c/' in path:
        m = _YT_C.search(path)
        if m:
            return f"youtube.com/c/{m.group(1)}"
    if '/user/' in path:
        m = _YT_USER.search(path)
        if m:
            return f"youtube.com/user/{m.group(1)}"
    return f"youtube.com{path.rstrip('/')}"


def normalize_url(url: str | None) -> str | None:
    """Normalize a URL to its duplicate-matching key (parity:
    app/models.py:57-103): lowercase, drop scheme/www./trailing slash/query;
    YouTube URLs collapse to canonical video/playlist/channel forms.
    Unparseable input degrades to ``url.strip().lower()``.
    """
    if not url or not url.strip():
        return None
    url = url.strip().lower()
    try:
        parsed = urlparse(url)
        host = parsed.netloc
        if host.startswith('www.'):
            host = host[4:]
        if 'youtube.com' in host or 'youtu.be' in host:
            return _normalize_youtube(parsed.path, parsed.query, host)
        normalized = host + parsed.path.rstrip('/')
        return normalized or None
    except Exception:
        return url


# --- URL search variants (compat; unused by the batch engine) ----------------

def url_search_variants(url: str | None) -> list[str]:
    """Protocol/www/trailing-slash variant fan-out (parity:
    app/models.py:206-260). The batch engine does not probe a remote search
    index, so this exists only for API compatibility and tests."""
    if not url or not url.strip():
        return []
    url = url.strip()
    if not url.startswith(('http://', 'https://')):
        return []
    variants: set[str] = {url}
    try:
        parsed = urlparse(url.lower())
        host = parsed.netloc
        path = parsed.path.rstrip('/')
        if 'youtube.com' in host or 'youtu.be' in host:
            variants.update(_youtube_search_variants(parsed, host))
            variants.add(url)
            variants.add(url.lower())
            return [v for v in variants if v and v.strip()]
        base = host[4:] if host.startswith('www.') else host
        www = host if host.startswith('www.') else f"www.{base}"
        for proto in ('https://', 'http://'):
            for h in (base, www):
                variants.add(f"{proto}{h}{path}")
                variants.add(f"{proto}{h}{path}/")
        variants.add(f"{base}{path}")
    except Exception:
        return []
    return [v for v in variants if v and v.strip()]


def _youtube_search_variants(parsed, host: str) -> list[str]:
    """YouTube variant fan-out (parity: app/models.py:263-333)."""
    query = parse_qs(parsed.query)
    out: list[str] = []
    vid = _youtube_video_id(host, parsed.path, query)
    if vid and len(vid) == 11:
        out.extend([
            f"https://www.youtube.com/watch?v={vid}",
            f"https://youtube.com/watch?v={vid}",
            f"http://www.youtube.com/watch?v={vid}",
            f"http://youtube.com/watch?v={vid}",
            f"https://youtu.be/{vid}",
            f"http://youtu.be/{vid}",
            f"https://www.youtube.com/embed/{vid}",
            f"http://www.youtube.com/embed/{vid}",
            f"https://www.youtube.com/v/{vid}",
            f"https://www.youtube.com/shorts/{vid}",
            f"https://www.youtube.com/live/{vid}",
            f"https://m.youtube.com/watch?v={vid}",
            vid,
        ])
    if 'list' in query:
        pl = query['list'][0]
        out.extend([
            f"https://www.youtube.com/playlist?list={pl}",
            f"https://youtube.com/playlist?list={pl}",
            pl,
        ])
    return out


# --- field validity -----------------------------------------------------------

def is_valid_field(value) -> bool:
    """Scalar/list field validity (parity: app/hash_detector.py:156-165):
    rejects None, blank strings, and the literal placeholder "string"."""
    if value is None:
        return False
    if isinstance(value, str):
        s = value.strip()
        return bool(s) and s.lower() != "string"
    if isinstance(value, list):
        return any(v and str(v).strip().lower() != "string" for v in value)
    return False


def is_valid_search_value(value, min_length: int = 3) -> bool:
    """Search-value validity (parity: app/wlo_client.py:222-235): must be a
    non-blank string of length >= min_length that is not a placeholder."""
    if not value or not isinstance(value, str):
        return False
    value = value.strip()
    if len(value) < min_length:
        return False
    return value.lower() not in {"string", "n/a", "unknown", ""}


# --- metadata blocking keys -----------------------------------------------------

def title_block_keys(title) -> list[str]:
    """Corpus-self analog of the reference's title candidate search
    (app/wlo_client.py:265-283): the raw title and, when suffix-stripping
    changes it, the normalized title — both trimmed+lowercased so the
    blocking join is case-insensitive. Empty list when the title fails
    search-value validity (app/wlo_client.py:222-235)."""
    if not is_valid_search_value(title):
        return []
    keys = [title.strip().lower()]
    norm = normalize_title(title)
    if norm:
        k = norm.strip().lower()
        if k and k not in keys:
            keys.append(k)
    return keys


def description_block_key(description) -> str | None:
    """Corpus-self analog of the reference's description-prefix search
    (app/wlo_client.py:306-311, DESCRIPTION_SEARCH_LENGTH=100): the first
    100 characters, trimmed+lowercased, as one blocking key. None when the
    description fails search-value validity."""
    from dedup.config import DESCRIPTION_SEARCH_LENGTH
    if not is_valid_search_value(description):
        return None
    key = description[:DESCRIPTION_SEARCH_LENGTH].strip().lower()
    return key or None


# --- Spark wrappers -------------------------------------------------------------

@F.pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(normalize_url)


# "simple" URLs — the overwhelming majority of a web corpus — normalize with
# pure string ops that a native expression chain replicates exactly:
# scheme://host/path with lowercase-safe charset, no userinfo/port/params,
# not YouTube. Everything else falls back to the Python UDF. Equivalence to
# `normalize_url` is hypothesis-tested (tests/test_normalize_native.py).
_SIMPLE_URL_RE = r'^https?://[a-z0-9.-]+(/[^?#;@:\\]*)?([?#].*)?$'
_YT_HINT_RE = r'youtube\.com|youtu\.be'


def norm_url_col(col):
    """Native normalize_url for simple URLs (null for non-simple — caller
    must route those through `normalize_url_udf`). Whole-stage-codegen
    friendly: no Python in the hot path."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(F.trim(c))
    simple = u.rlike(_SIMPLE_URL_RE) & ~u.rlike(_YT_HINT_RE)
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(u, r'^https?://', ''),
            r'[?#].*$', ''),
        r'^www\.', '')
    native = F.regexp_replace(stripped, r'/+$', '')
    native = F.when(F.length(native) > 0, native)
    return F.when(simple, native)


def with_norm_url(df, url_col: str = "url", out_col: str = "norm_url"):
    """df + normalized-url column, Python only where unavoidable.

    Splits rows into a native branch (simple http(s) URLs, codegen regexps)
    and a UDF branch (YouTube / odd syntax), then unions — the ArrowEval
    stage touches only the odd rows, which keeps the corpus-wide norm_url
    join JVM-side at web scale."""
    c = F.lower(F.trim(F.col(url_col)))
    is_simple = c.rlike(_SIMPLE_URL_RE) & ~c.rlike(_YT_HINT_RE)
    native = df.where(is_simple).withColumn(out_col, norm_url_col(url_col))
    fallback = df.where(~is_simple | is_simple.isNull()).withColumn(
        out_col, normalize_url_udf(F.col(url_col)))
    return native.unionByName(fallback)


@F.pandas_udf(StringType())
def normalize_title_udf(titles: pd.Series) -> pd.Series:
    return titles.map(normalize_title)


# NB: module-level pandas_udf return types must be TYPE OBJECTS, not DDL
# strings — DDL parsing needs an active SparkSession, and this module is
# imported inside executor workers (no session) when UDF closures unpickle.
@F.pandas_udf(ArrayType(StringType()))
def url_variants_udf(urls: pd.Series) -> pd.Series:
    return urls.map(url_search_variants)


def valid_field_col(col):
    """T8 as a native column expression (string columns only — the corpus
    table is flat, so the list branch never applies)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return c.isNotNull() & (F.length(t) > 0) & (F.lower(t) != "string")


def valid_search_value_col(col, min_length: int = 3):
    """S5 as a native column expression."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return (
        c.isNotNull()
        & (F.length(t) >= min_length)
        & ~F.lower(t).isin("string", "n/a", "unknown", "")
    )
