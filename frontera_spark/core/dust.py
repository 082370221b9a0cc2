"""DUST rule mining — "Different URLs with Similar Text" (Bar-Yossef,
Keidar, Schonfeld, WWW'07): learn which query parameters are content-
IRRELEVANT per host from observed (url, content-signature) pairs, then
strip them from candidate links BEFORE they enter the frontier, so URL
aliases (session ids, tracking refs, mirror params) collapse in the
seen-set instead of being fetched and discarded post-hoc.

frontera's answer to aliasing is static canonicalization
(frontera/utils/url.py:~1-60, SURVEY §2.2 P5) — scheme/host lowercasing,
fragment stripping — which cannot know that ``?sess=`` is noise on one
host and load-bearing on another. This module LEARNS that distinction
from the crawl's own fetch history, the way the DUST paper mines rewrite
rules from a URL log, restricted to the rule family that dominates real
crawls: "parameter p on host h never changes the content".

Mining semantics (per ``(host, param)`` candidate):

- strip ``param`` from every URL of ``host`` (URLs without the param
  participate unchanged — a rule must also license collapsing ``u`` with
  ``u?p=v``), key the URLs by the stripped form;
- a stripped-key group with >= 2 URLs is evidence: if every member has
  the SAME content signature the group supports the rule (contributing
  ``group_size - 1`` collapsible fetches), if signatures differ it is a
  violation;
- the rule holds iff there is at least one multi-URL group and ZERO
  violations (the paper's "valid rule" test, exact rather than
  confidence-thresholded — one counterexample kills the rule, because
  applying a wrong rule silently drops pages from the crawl).

Scale shape (10^10-URL design point): the vocabulary of observed
``(host, param)`` keys is broadcast (bounded by hosts x distinct param
names, not URLs); the candidate expansion is |log| x avg-params-per-host
rows of (host, param, stripped-key, sig) — narrow strings, one shuffle
on the group key; the rule table is O(hosts x params) and collapses to a
driver-side map only after aggregation. Applying rules is a pure
codegen projection (higher-order array functions, no UDF, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# param key of a "k=v" token (value-less "k" tokens key as themselves)
_KEY = lambda x: F.element_at(F.split(x, "=", 2), 1)  # noqa: E731


def _host_expr(url: Column) -> Column:
    # try_parse_url: Spark 4's parse_url THROWS on malformed URLs; a NULL
    # host simply never matches a mined rule (and mines into a NULL group
    # no valid host shares)
    return F.try_parse_url(url, F.lit("HOST"))


def _base_and_params(url: Column) -> tuple[Column, Column]:
    """(base-before-'?', params array) — empty array when no query string.
    Splits on the FIRST '?' (canonicalized URLs carry at most one)."""
    qpos = F.locate("?", url)
    base = F.when(qpos > 0, F.substring(url, F.lit(1), qpos - 1)).otherwise(url)
    params = F.when(
        qpos > 0,
        F.filter(
            F.split(F.substring(url, qpos + 1, F.length(url)), "&"),
            lambda x: F.length(x) > 0,
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base, params


def mine_dust_rules(
    log: DataFrame,
    url_col: str = "url",
    sig_col: str = "sig",
    host_col: str | None = None,
) -> DataFrame:
    """Mine per-(host, param) irrelevance rules from a (url, sig) log.

    Returns ``(host, param, n_groups, n_violations, support, irrelevant)``:
    ``n_groups`` = stripped-key groups with >= 2 URLs, ``support`` = URLs a
    clean group would collapse (sum of group_size - 1 over violation-free
    groups), ``irrelevant`` = n_groups > 0 AND n_violations = 0. Callers
    gate on ``irrelevant AND support >= min_support`` (rules_to_map).
    """
    url = F.col(url_col)
    host = F.col(host_col) if host_col else _host_expr(url)
    base, params = _base_and_params(url)
    parsed = log.select(
        host.alias("host"),
        F.col(sig_col).alias("_sig"),
        base.alias("_base"),
        params.alias("_params"),
    )
    vocab = (
        parsed.select("host", F.explode(F.transform("_params", _KEY)).alias("param"))
        .distinct()
    )
    # candidate expansion: every URL of a host x every param seen on that
    # host. vocab is hosts x param-names — broadcast, never shuffled.
    cand = parsed.join(F.broadcast(vocab), "host")
    stripped = F.concat(
        F.col("_base"),
        F.lit("|"),
        F.array_join(
            F.array_sort(
                F.filter("_params", lambda x: _KEY(x) != F.col("param"))
            ),
            "&",
        ),
    )
    groups = cand.groupBy("host", "param", stripped.alias("_key")).agg(
        F.count("*").alias("_n"),
        F.countDistinct("_sig").alias("_nsig"),
    )
    return groups.groupBy("host", "param").agg(
        F.sum((F.col("_n") > 1).cast("long")).alias("n_groups"),
        F.sum(((F.col("_n") > 1) & (F.col("_nsig") > 1)).cast("long")).alias(
            "n_violations"
        ),
        F.sum(
            F.when((F.col("_n") > 1) & (F.col("_nsig") == 1), F.col("_n") - 1)
            .otherwise(F.lit(0))
        ).alias("support"),
        ((F.sum((F.col("_n") > 1).cast("long")) > 0)
         & (F.sum(((F.col("_n") > 1) & (F.col("_nsig") > 1)).cast("long")) == 0)
         ).alias("irrelevant"),
    )


def rules_to_map(rules: DataFrame, min_support: int = 1) -> dict[str, list[str]]:
    """Collect validated rules to a host -> [params-to-strip] dict.

    O(hosts x params) rows — the only driver-side materialization in the
    DUST path, and the form the rewrite expression embeds as a literal map
    (broadcast with the plan, no join)."""
    rows = (
        rules.filter(F.col("irrelevant") & (F.col("support") >= min_support))
        .select("host", "param")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r["host"], []).append(r["param"])
    return {h: sorted(ps) for h, ps in out.items()}


def strip_params_expr(
    url: Column, rules_map: dict[str, list[str]], host: Column | None = None
) -> Column:
    """URL with the host's mined-irrelevant params removed — pure codegen
    (create_map literal lookup + higher-order filter), no UDF, no join."""
    if not rules_map:
        return url
    if host is None:
        host = _host_expr(url)
    m = F.create_map(
        *[
            lit
            for h, ps in sorted(rules_map.items())
            for lit in (F.lit(h), F.lit(",".join(ps)))
        ]
    )
    bad = F.split(F.coalesce(m[host], F.lit("")), ",")
    return _strip_expr(url, bad)


def strip_named_params_expr(url: Column, names: tuple[str, ...]) -> Column:
    """URL with the NAMED params removed on every host — the fetch
    simulator's server-side alias resolution (a server that ignores
    ``?sess=`` for routing), and the building block the host-keyed
    ``strip_params_expr`` shares."""
    if not names:
        return url
    return _strip_expr(url, F.array(*[F.lit(n) for n in names]))


def _strip_expr(url: Column, bad: Column) -> Column:
    base, params = _base_and_params(url)
    kept = F.filter(params, lambda x: ~F.array_contains(bad, _KEY(x)))
    return F.when(F.locate("?", url) == 0, url).otherwise(
        F.concat(
            base,
            F.when(
                F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
            ).otherwise(F.lit("")),
        )
    )


def apply_dust_rules(
    df: DataFrame,
    rules_map: dict[str, list[str]],
    url_col: str = "url",
    host_col: str | None = None,
) -> DataFrame:
    """Rewrite ``url_col`` in place by the mined rules (no-op on an empty
    rule set — the pre-first-tick fast path in the crawl loop)."""
    if not rules_map:
        return df
    host = F.col(host_col) if host_col else None
    return df.withColumn(url_col, strip_params_expr(F.col(url_col), rules_map, host))
