"""Golden-vector tests for canonicalization + fingerprints (FIXTURES.md §6).

Mirrors frontera's tests/test_utils_fingerprint.py and test_utils_url.py
(golden hex vectors; crc32 signedness case).
"""

import hashlib
import zlib

import pytest

from frontera_spark.functions.fingerprint import (
    crc32_signed,
    hostname_local_fingerprint,
    hostname_local_fingerprint64,
    md5_hex,
    sha1_hex,
)
from frontera_spark.functions.urls import canonicalize_url, parse_domain_info

CANON_CASES = [
    # scheme/host lowercase
    ("HTTP://ExAmPle.com/Path", "http://example.com/Path"),
    # query sort
    ("http://example.com/?b=2&a=1", "http://example.com/?a=1&b=2"),
    ("http://example.com/?b=2&a=1&a=0", "http://example.com/?a=0&a=1&b=2"),
    # blank values kept
    ("http://example.com/?a=&b=1", "http://example.com/?a=&b=1"),
    # fragment strip
    ("http://example.com/page#frag", "http://example.com/page"),
    ("http://example.com/#", "http://example.com/"),
    # default port strip
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # empty path
    ("http://example.com", "http://example.com/"),
    # percent-encoding normalized (lowercase hex → canonical quoting)
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    # space in query
    ("http://example.com/?q=a b", "http://example.com/?q=a+b"),
    # trailing dot host
    ("http://example.com./x", "http://example.com/x"),
    # idempotency sentinel (already canonical)
    ("https://h001.example.test/i/img00000001", "https://h001.example.test/i/img00000001"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_url(raw, expected):
    assert canonicalize_url(raw) == expected


def test_canonicalize_idempotent():
    for raw, _ in CANON_CASES:
        once = canonicalize_url(raw)
        assert canonicalize_url(once) == once


def test_sha1_md5_golden():
    # frontera/utils/fingerprint.py golden values (standard hashes)
    assert sha1_hex("http://example.com/") == hashlib.sha1(b"http://example.com/").hexdigest()
    assert sha1_hex("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_crc32_signed():
    # a value whose unsigned crc32 has the high bit set
    s = "www.example.com"
    u = zlib.crc32(s.encode())
    v = crc32_signed(s)
    assert v == (u - 2**32 if u >= 2**31 else u)
    assert -(2**31) <= v < 2**31
    # golden pair: pick a known high-bit case
    assert crc32_signed("hello") == zlib.crc32(b"hello") - (2**32 if zlib.crc32(b"hello") >= 2**31 else 0)


def test_hostname_local_fingerprint_locality():
    """Same-host URLs share the first 8 hex chars (crc32 prefix)."""
    a = hostname_local_fingerprint("http://news.example.com/a")
    b = hostname_local_fingerprint("http://news.example.com/b/c?d=1")
    c = hostname_local_fingerprint("http://other.example.org/a")
    assert len(a) == 40 and len(b) == 40
    assert a[:8] == b[:8]
    assert a[:8] != c[:8]
    assert a != b


def test_hostname_local_fingerprint64_locality():
    a = hostname_local_fingerprint64("http://news.example.com/a")
    b = hostname_local_fingerprint64("http://news.example.com/b")
    c = hostname_local_fingerprint64("http://other.example.org/a")
    assert (a >> 32) & 0xFFFFFFFF == (b >> 32) & 0xFFFFFFFF
    assert (a >> 32) & 0xFFFFFFFF != (c >> 32) & 0xFFFFFFFF
    assert -(2**63) <= a < 2**63


def test_parse_domain_info():
    d = parse_domain_info("http://blog.news.example.com:8080/x?y=1")
    assert d["name"] == "blog.news.example.com"
    assert d["netloc"] == "blog.news.example.com:8080"
    assert d["tld"] == "com"
    assert d["sld"] == "example.com"
    assert d["subdomain"] == "blog.news"
    assert d["scheme"] == "http"


def test_spark_parity(spark):
    """Spark-side columns agree with the pure-Python reference fns."""
    from pyspark.sql import functions as F

    from frontera_spark.functions.fingerprint import crc32_signed_col, partition_id_col
    from frontera_spark.functions.urls import canonicalize_urls_udf, host_col

    urls = [r for r, _ in CANON_CASES]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = (
        df.withColumn("canon", canonicalize_urls_udf("url"))
        .withColumn("host", host_col(F.col("canon")))
        .withColumn("crc", crc32_signed_col(F.col("host")))
        .withColumn("pid", partition_id_col(F.col("host"), 8))
        .collect()
    )
    for r in rows:
        assert r.canon == canonicalize_url(r.url)
        assert r.host is not None, r.url
        assert r.crc == crc32_signed(r.host)
        assert r.pid == crc32_signed(r.host) % 8


def test_fast_path_is_fixed_point():
    """Every URL matching _ALREADY_CANONICAL_RE must be a fixed point of
    canonicalize_url (the vectorized UDF returns such rows unchanged)."""
    import random
    import string

    from frontera_spark.functions.urls import _ALREADY_CANONICAL_RE

    rng = random.Random(42)
    path_chars = string.ascii_letters + string.digits + "!$&'()*+,;=:@~._/-"
    host_chars = string.ascii_lowercase + string.digits + "-"
    checked = 0
    for _ in range(5000):
        host = ".".join(
            "".join(rng.choice(host_chars) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(1, 3))
        )
        path = "/" + "".join(rng.choice(path_chars) for _ in range(rng.randint(0, 20)))
        url = f"{rng.choice(['http', 'https', 'ftp'])}://{host}{path}"
        if _ALREADY_CANONICAL_RE.fullmatch(url):
            assert canonicalize_url(url) == url, url
            checked += 1
    assert checked > 4000  # the generator really exercises the fast path

    # URLs the canonicalizer would rewrite must never match the fast regex
    # (the regex may conservatively exclude some fixed points — that only
    # costs speed, never correctness)
    for messy in [
        "HTTPS://Host.Example/p", "https://h.example.test/p?b=2&a=1",
        "https://h.example.test/p#frag", "https://h.example.test/%41",
        "https://h.example.test", "https://h.example.test:443/p",
        "https://user@h.example.test/p", " https://h.example.test/p",
        "https://h.example.test./p",
    ]:
        assert not _ALREADY_CANONICAL_RE.fullmatch(messy), messy


def test_jvm_gate_matches_python_regex(spark):
    """with_canonical_url routes via a Java rlike rendering of the fast-path
    regex: (a) Java and Python regexes must agree row-for-row, and (b) the
    whole-frame result must equal the pure-UDF canonicalization."""
    import random
    import string

    from pyspark.sql import functions as F

    from frontera_spark.functions.urls import (
        _ALREADY_CANONICAL_JAVA,
        _ALREADY_CANONICAL_RE,
        with_canonical_url,
    )

    rng = random.Random(7)
    path_chars = string.ascii_letters + string.digits + "!$&'()*+,;=:@~._/-"
    urls = [r for r, _ in CANON_CASES]
    for _ in range(500):
        host = "h" + str(rng.randint(0, 99)) + ".example.test"
        path = "/" + "".join(rng.choice(path_chars) for _ in range(rng.randint(0, 20)))
        extra = rng.choice(["", "?b=2&a=1", "#frag", ":8080"])
        urls.append(f"{rng.choice(['http', 'https', 'HTTP'])}://{host}{path}{extra}")

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.withColumn("jvm", F.col("url").rlike(_ALREADY_CANONICAL_JAVA)).collect()
    for r in rows:
        assert r.jvm == bool(_ALREADY_CANONICAL_RE.fullmatch(r.url)), r.url

    out = {r.url: r.canonical_url for r in with_canonical_url(df).collect()}
    assert len(out) == len(set(urls))
    for u in set(urls):
        assert out[u] == canonicalize_url(u), u


def test_with_canonical_url_preserves_null_rows(spark):
    """A NULL url must survive with a NULL canonical (cardinality preserved);
    the engine's host IS NULL filter is the one place such rows drop."""
    from pyspark.sql import functions as F

    from frontera_spark.functions.urls import with_canonical_url

    df = spark.createDataFrame(
        [("https://h.test/ok",), (None,), ("HTTPS://Up.Test/x",)], "url string"
    )
    out = with_canonical_url(df).collect()
    assert len(out) == 3
    got = {r.url: r.canonical_url for r in out}
    assert got["https://h.test/ok"] == "https://h.test/ok"
    assert got[None] is None
    assert got["HTTPS://Up.Test/x"] == "https://up.test/x"
