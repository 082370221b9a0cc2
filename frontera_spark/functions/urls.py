"""URL canonicalization and domain parsing.

Reference semantics: frontera fingerprints URLs (frontera/contrib/middlewares/
fingerprint.py:~20-50) over a canonical form whose rules live in the w3lib
dependency (``w3lib.url.canonicalize_url``): lowercase scheme/host, sort query
parameters (keeping blank values), strip the fragment, strip default ports,
normalize percent-escapes, ensure a non-empty path. Domain parsing mirrors
``frontera/utils/url.py:~30-100`` (parse_domain_info → netloc/sld/tld/
subdomain, without the optional tldextract mode — we use a public-suffix-free
heuristic: tld = last label, sld = last two labels).

Spark-side: there is no built-in canonicalizer, so the hot path is a
*vectorized* pandas UDF (Arrow-batched; no per-row Python UDFs — BASELINE
input_hint). Host extraction alone uses the built-in ``F.parse_url`` and stays
JVM-side.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
# RFC 3986 sub-delims + unreserved extras kept verbatim in paths
_PATH_SAFE = "/%!$&'()*+,;=:@~-._"


def _idna_host(host: str) -> str:
    """Lowercased host → punycode when non-ASCII (IDNA, stdlib codec).

    Invalid IDN labels (empty, overlong, bad codepoints) return unchanged —
    the engine's host sanity filters own rejection, canonicalization stays
    total."""
    if host.isascii():
        return host
    try:
        return host.encode("idna").decode("ascii")
    except UnicodeError:
        return host


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL (pure Python; the UDF vectorizes over this).

    Rules (w3lib-compatible subset, deterministic):
      1. scheme + host lowercased
      2. default port stripped
      3. fragment stripped
      4. query params sorted by (key, value); blank values kept
      5. percent-escapes normalized (unquote+requote with a fixed safe set)
      6. empty path → "/"
      7. internationalized hosts → punycode (IDNA; stdlib codec), so the
         unicode and xn-- spellings of one host share one fingerprint;
         labels the codec rejects are left as-is (dropped later by the
         host sanity filters)
    """
    try:
        scheme, netloc, path, query, _frag = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = scheme.lower()
    host, sep, port = netloc.partition(":")
    host = host.lower().rstrip(".")
    if not host:
        # no usable authority (e.g. 'http://.//x'): urlunsplit with an empty
        # netloc and a path starting '//' would mis-serialize (the path leaks
        # into authority position on re-parse, breaking idempotence). Such
        # rows are dropped later by the host IS NULL filter; return the
        # trimmed input untouched.
        return url.strip()
    if "@" in host:  # userinfo@host
        userinfo, _, bare = host.rpartition("@")
        host = _idna_host(bare)
        netloc = f"{userinfo}@{host}"
    else:
        host = _idna_host(host)
        netloc = host
    if sep and port and port != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{netloc}:{port}"
    # protect escaped reserved chars (/, ?, %) from unquoting — w3lib's
    # _unquotepath trick — so %2F stays an escape instead of becoming a
    # path separator
    for reserved in ("2f", "2F", "3f", "3F"):
        path = path.replace("%" + reserved, "%25" + reserved.upper())
    path = quote(unquote(path), safe=_PATH_SAFE) or "/"
    if query:
        pairs = sorted(parse_qsl(query, keep_blank_values=True))
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


# Already-canonical fast path: URLs matching this are FIXED POINTS of
# canonicalize_url — lowercase scheme+host, no port/userinfo/trailing-dot
# host, non-empty path of characters quote() keeps verbatim (no %), no
# query (nothing to sort), no fragment. One vectorized C-regex pass skips
# the per-URL Python for them; in a real crawl the vast majority of links
# are already canonical. Pinned by test_fast_path_is_fixed_point.
_ALREADY_CANONICAL_RE = re.compile(
    r"[a-z][a-z0-9+.\-]*://[a-z0-9\-]+(\.[a-z0-9\-]+)*/[A-Za-z0-9!$&'()*+,;=:@~._/\-]*"
)


@pandas_udf(StringType())
def canonicalize_urls_udf(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer (Arrow-batched, fast path for fixed points)."""
    fast = urls.str.fullmatch(_ALREADY_CANONICAL_RE).fillna(False)
    if fast.all():
        return urls
    out = urls.copy()
    # NULL urls stay NULL (the engine's host IS NULL filter drops them)
    out[~fast] = urls[~fast].map(
        lambda u: canonicalize_url(u) if isinstance(u, str) else None
    )
    return out


# Java-regex rendering of the same fixed-point pattern (\A/\z = exact
# anchors; the class body is portable between re and java.util.regex —
# pinned by test_jvm_gate_matches_python_regex)
_ALREADY_CANONICAL_JAVA = r"\A(?:" + _ALREADY_CANONICAL_RE.pattern + r")\z"


def with_canonical_url(df, url_col: str = "url", out_col: str = "canonical_url"):
    """Canonicalize a whole DataFrame column, JVM-first.

    Rows whose URL is provably a fixed point of ``canonicalize_url`` (one
    C-regex pass, whole-stage codegen) copy through without ever leaving the
    JVM; only the remainder rides the Arrow pandas UDF. In a real crawl the
    overwhelming majority of extracted links are already canonical, so the
    Python lane sees a trickle — at 10^10 URLs this removes the Arrow
    round-trip (2× full-column serialization) from the schedule hot path.
    """
    is_fixed = F.col(url_col).isNotNull() & F.col(url_col).rlike(
        _ALREADY_CANONICAL_JAVA
    )
    fixed = df.filter(is_fixed).withColumn(out_col, F.col(url_col))
    # ~is_fixed is NULL for NULL urls and would silently drop the row —
    # route NULLs into this branch too (the UDF maps them to NULL, and the
    # helper preserves input cardinality for every caller)
    rest = df.filter(~F.coalesce(is_fixed, F.lit(False))).withColumn(
        out_col, canonicalize_urls_udf(url_col)
    )
    return fixed.unionByName(rest)


# Embedded static subset of the Mozilla Public Suffix List (publicsuffix.org,
# MPL-2.0 — rule DATA, not code): the multi-label suffixes a crawler's
# per-domain budgets most commonly mis-split on. Deliberately small and
# offline (no network fetch, no tldextract dependency); extend by adding
# entries — full PSL rule semantics are supported (plain, ``*.`` wildcard,
# ``!`` exception, any label depth). Single-label TLDs need no entry — the
# default rule ``*`` already handles them.
PUBLIC_SUFFIXES = frozenset(
    {
        # wildcard + exception rules (PSL semantics: '*' matches exactly one
        # label; '!' marks the registrable-domain exception to a wildcard)
        "*.ck", "!www.ck",
        "*.kawasaki.jp", "!city.kawasaki.jp",
        "*.kitakyushu.jp", "!city.kitakyushu.jp",
        "*.kobe.jp", "!city.kobe.jp",
        "*.nagoya.jp", "!city.nagoya.jp",
        "*.sapporo.jp", "!city.sapporo.jp",
        "*.sendai.jp", "!city.sendai.jp",
        "*.yokohama.jp", "!city.yokohama.jp",
        "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
        # 3-label plain rules (US locality scheme)
        "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.wa.us",
        "cc.ca.us", "lib.ca.us", "lib.ny.us",
        # UK
        "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "nhs.uk",
        "me.uk", "ltd.uk", "plc.uk",
        # Australia / New Zealand
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
        "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
        # Japan / Korea / China / Taiwan / Hong Kong
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
        "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
        "com.tw", "org.tw", "gov.tw", "edu.tw", "com.hk", "org.hk", "edu.hk",
        # India / South-East Asia
        "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "gov.in",
        "ac.in", "edu.in", "res.in",
        "com.sg", "org.sg", "edu.sg", "gov.sg", "com.my", "org.my", "gov.my",
        "co.th", "or.th", "ac.th", "go.th", "co.id", "or.id", "ac.id", "go.id",
        # Americas
        "com.br", "net.br", "org.br", "gov.br", "edu.br",
        "com.mx", "org.mx", "gob.mx", "edu.mx",
        "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
        "com.co", "net.co", "org.co", "com.pe", "com.ve", "com.uy", "com.ec",
        # Europe / Middle East / Africa
        "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
        "co.il", "org.il", "net.il", "ac.il", "gov.il",
        "co.za", "org.za", "net.za", "ac.za", "gov.za", "web.za",
        "com.pl", "net.pl", "org.pl", "edu.pl", "com.ua", "net.ua", "org.ua",
        "com.ru", "net.ru", "org.ru", "com.eg", "com.sa", "com.ng", "com.gh",
        "co.ke", "or.ke", "ac.ke",
    }
)


# Rules indexed by their rightmost label, parsed once at import: each entry
# is (labels right-to-left with the rightmost dropped, is_exception). The
# per-host match then touches only the handful of rules sharing its TLD.
_PSL_BY_TLD: dict = {}
for _rule in PUBLIC_SUFFIXES:
    _exc = _rule.startswith("!")
    _labs = _rule.lstrip("!").split(".")
    _PSL_BY_TLD.setdefault(_labs[-1], []).append((_labs[-2::-1], _exc))
del _rule, _exc, _labs


def _psl_suffix_len(labels: list[str]) -> int:
    """Public-suffix label count for a host, PSL algorithm
    (publicsuffix.org/list/): among matching rules ('*' matches exactly one
    label; a rule matches when its labels are a suffix of the host's), an
    exception rule prevails with suffix = its labels minus the leftmost;
    otherwise the longest match wins; no match falls back to the implicit
    default rule '*' (suffix = the last label)."""
    if not labels:
        return 0
    best = 1  # implicit default rule '*'
    rev = labels[::-1]
    for rest, is_exc in _PSL_BY_TLD.get(rev[0], ()):
        n = len(rest) + 1
        if len(rev) < n:
            continue
        if all(r == "*" or r == h for r, h in zip(rest, rev[1:])):
            if is_exc:
                return n - 1  # exception beats every other rule
            best = max(best, n)
    return best


def parse_domain_info(url: str, public_suffix: bool = False) -> dict:
    """netloc / name / scheme / sld / tld / subdomain, frontera-shaped.

    frontera/utils/url.py:~30-100 returns these six fields in two modes:
    label-positional (default — tld = last label, sld = last two) and
    tldextract-backed. ``public_suffix=True`` reproduces the tldextract mode
    against the embedded static ``PUBLIC_SUFFIXES`` subset with full PSL
    rule semantics (plain, wildcard, exception, any label depth): a host
    ending in a matched suffix splits as tld = that suffix, sld =
    registrable domain (one label + suffix) — so ``shop.example.co.uk``
    budgets under ``example.co.uk``, not ``co.uk``, and
    ``foo.bar.kawasaki.jp`` under ``foo.bar.kawasaki.jp`` (``*.kawasaki.jp``
    wildcard). Hosts matching no embedded rule fall back to the implicit
    default rule (suffix = last label — identical to the positional mode),
    keeping the flag safe to flip on mixed corpora.
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return {"netloc": "", "name": "", "scheme": "", "sld": "", "tld": "", "subdomain": ""}
    netloc = parts.netloc
    host = netloc.partition(":")[0].lower()
    labels = [x for x in host.split(".") if x]
    suffix_len = _psl_suffix_len(labels) if public_suffix else 1
    if suffix_len > 1 and len(labels) <= suffix_len:
        suffix_len = 1  # host IS a public suffix: positional fallback (r3 golden)
    if len(labels) >= suffix_len + 1:
        tld = ".".join(labels[-suffix_len:])
        sld = ".".join(labels[-(suffix_len + 1):])
        subdomain = ".".join(labels[: -(suffix_len + 1)])
    else:
        tld = ""
        sld = host
        subdomain = ""
    return {
        "netloc": netloc,
        "name": host,
        "scheme": parts.scheme.lower(),
        "sld": sld,
        "tld": tld,
        "subdomain": subdomain,
    }


_DOMAIN_STRUCT = StructType(
    [StructField(f, StringType()) for f in ("netloc", "name", "scheme", "sld", "tld", "subdomain")]
)


@pandas_udf(_DOMAIN_STRUCT)
def parse_domains_udf(urls: pd.Series) -> pd.DataFrame:
    """Vectorized domain parser → struct column (positional mode)."""
    return pd.DataFrame([parse_domain_info(u) for u in urls])


def parse_domains_udf_for(public_suffix: bool = False):
    """Vectorized domain parser with the suffix mode baked in — pass
    ``public_suffix=True`` for registrable-domain sld/tld splitting against
    the embedded ``PUBLIC_SUFFIXES`` subset."""
    if not public_suffix:
        return parse_domains_udf

    @pandas_udf(_DOMAIN_STRUCT)
    def _udf(urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([parse_domain_info(u, public_suffix=True) for u in urls])

    return _udf


def host_col(url: Column) -> Column:
    """JVM-side host extraction (lowercased) — no Python in the hot path.

    ``try_parse_url`` (Spark 4) returns NULL for malformed URLs instead of
    failing the task — at 100 TB of crawled links, malformed URLs are a
    certainty and must not kill the stage.
    """
    return F.lower(F.try_parse_url(url, F.lit("HOST")))
