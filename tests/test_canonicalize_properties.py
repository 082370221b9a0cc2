"""Property-based invariants of the URL canonicalizer (hypothesis).

Idempotence is load-bearing: re-offered links are canonicalized again, so a
non-fixed-point output would fingerprint differently on the second pass and
duplicate the frontier row.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from frontera_spark.functions.urls import canonicalize_url

_host_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-ABCDEF", min_size=1, max_size=8
)
_path_piece = st.text(alphabet="abcXYZ019%/!$&'()*+,;=:@~-._ ", max_size=12)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "ftp"]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/" + draw(_path_piece)
    q = draw(
        st.sampled_from(["", "?a=1&b=2", "?b=2&a=1&a=0", "?x", "?=v", "?a=%20&b=+"])
    )
    frag = draw(st.sampled_from(["", "#f", "#a b"]))
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@settings(max_examples=500, suppress_health_check=list(HealthCheck))
@given(_urls())
def test_canonicalize_idempotent(u):
    c1 = canonicalize_url(u)
    assert canonicalize_url(c1) == c1


@settings(max_examples=500, suppress_health_check=list(HealthCheck))
@given(
    st.sampled_from(
        ["http://", "https://h.test", "https://user@h.test:81", "https://h.test."]
    ),
    st.text(alphabet="ab%2F3fA/?#:@&=+ .~é", min_size=0, max_size=25),
)
def test_canonicalize_idempotent_hostile(prefix, tail):
    # hostile inputs: escaped reserved chars, userinfo, trailing-dot hosts,
    # empty authorities, non-ascii — never raise, always reach a fixed point
    u = prefix + tail
    c1 = canonicalize_url(u)
    assert canonicalize_url(c1) == c1


def test_idna_host_punycode():
    # unicode and xn-- spellings of one host must canonicalize identically
    # (shared fingerprint — a real crawl sees both)
    a = canonicalize_url("https://MÜNCHEN.example.DE/x")
    b = canonicalize_url("https://xn--mnchen-3ya.example.de/x")
    assert a == b == "https://xn--mnchen-3ya.example.de/x"
    # userinfo + port preserved around the converted host
    assert (
        canonicalize_url("https://user@BÜCHER.example:8443/p")
        == "https://user@xn--bcher-kva.example:8443/p"
    )
    # an invalid IDN label (overlong) stays as-is instead of raising
    bad = "https://" + "ü" * 80 + ".example/x"
    out = canonicalize_url(bad)
    assert "ü" * 80 in out and canonicalize_url(out) == out


@settings(max_examples=200, suppress_health_check=list(HealthCheck))
@given(
    label=st.text(
        alphabet="abcüößñ0-9",
        min_size=1,
        max_size=20,
    )
)
def test_idna_hosts_stay_idempotent(label):
    u = f"https://{label}.example/x"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_empty_authority_regression():
    # 'http://.//f 2:A' once canonicalized to 'http://f%202:A', whose re-parse
    # moved path into authority position (non-idempotent); now passed through
    u = "http://.//f 2:A"
    assert canonicalize_url(u) == u
    assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)
