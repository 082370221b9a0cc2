"""robots.txt rule evaluation (RFC 9309 subset) as DataFrame operators.

frontera itself delegates robots handling to the crawler (scrapy's
RobotsTxtMiddleware downloads and enforces robots.txt; frontera only carries
the resulting skip decision), but the north rule requires robots gating
inside the scheduler, so the engine evaluates parsed rules at schedule time:

- ``parse_robots_txt(text)`` → ``[(rule, pattern)]`` for the ``User-agent: *``
  group(s) — ``Disallow:`` / ``Allow:`` lines (the RFC 9309 core). Patterns
  may use the special characters RFC 9309 §2.2.3 defines: ``*`` matches any
  character run, a trailing ``$`` anchors the pattern at the path's end (a
  mid-pattern ``$`` is literal). ``parse_robots(text)`` additionally returns
  the group's ``Crawl-delay`` (a de-facto extension most crawlers honor).
- ``rules_df(spark, {host: robots_txt})`` → DataFrame(host, rule, prefix,
  pattern_re, wild) — wildcard patterns are pre-compiled to anchored regexes
  driver-side so the match stays a codegen expression.
- ``with_allowed(links, rules)`` → links + ``allowed boolean`` via RFC 9309
  §2.2.2 precedence: the most-specific (longest, in pattern octets) matching
  rule wins; on equal length Allow wins; no matching rule ⇒ allowed.
- ``policies_from_robots(spark, {host: robots_txt})`` → the per-host
  politeness policy frame ``(host, robots_allow, delay_s, budget)`` that
  ``DomainMetadata.set_policies`` consumes: ``Crawl-delay`` becomes the
  token-bucket refill interval, a bare full ban (``Disallow: /`` with no
  Allow carve-outs) drops the whole host at pop time.

Scale shape: the rule table is hosts-sized — broadcast it; the link stream
never shuffles. Longest-match is a broadcast join + one hash aggregation
keyed on the link (max_by over (pattern length, rule)), no window; wildcard
rules match via ``regexp_like`` with the regex pre-built per RULE (hosts-
sized), never per link.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_robots(text: str) -> tuple[list[tuple[str, str]], float | None]:
    """Extract ``([(rule, pattern)], crawl_delay)`` for ``User-agent: *``
    groups.

    A group = consecutive User-agent lines followed by rule lines (RFC 9309
    §2.1); only groups naming ``*`` contribute. An empty Disallow value
    means "allow everything" and yields no rule. ``Crawl-delay`` (not in
    RFC 9309, but honored by most fetchers and emitted by real sites) is
    taken from the first ``*`` group that sets it to a valid non-negative
    number; absent ⇒ None.
    """
    rules: list[tuple[str, str]] = []
    delay: float | None = None
    applies = False
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:  # a new group starts; reset applicability
                applies = False
                in_agent_run = True
            applies = applies or value == "*"
        else:
            in_agent_run = False
            if applies and field in ("disallow", "allow") and value:
                rules.append(("deny" if field == "disallow" else "allow", value))
            elif applies and field == "crawl-delay" and delay is None:
                try:
                    parsed = float(value)
                except ValueError:
                    continue
                if parsed >= 0:
                    delay = parsed
    return rules, delay


def parse_robots_txt(text: str) -> list[tuple[str, str]]:
    """Rules half of :func:`parse_robots` (the original round-2 surface)."""
    return parse_robots(text)[0]


def parse_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directive values, in file order.

    Per the sitemaps.org robots.txt protocol (and RFC 9309 §2.2.4 "other
    records"), the field is group-INDEPENDENT — it applies regardless of
    surrounding ``User-agent`` groups — so extraction ignores group state
    entirely. Real crawls bootstrap here: fetch /robots.txt, follow the
    advertised sitemaps, seed the frontier from their ``<loc>`` sets
    (``FrontierEngine.add_seeds_robots`` wires the chain)."""
    urls: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            urls.append(value.strip())
    return urls


def pattern_regex(pattern: str) -> str | None:
    """RFC 9309 §2.2.3 pattern → anchored regex, or None for plain prefixes.

    ``*`` matches any character run; a TRAILING ``$`` anchors at end-of-path
    (mid-pattern ``$`` is a literal octet). Plain prefixes return None so the
    caller keeps the cheaper ``startswith`` codegen path.
    """
    if "*" not in pattern and not pattern.endswith("$"):
        return None
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return "^" + rx + ("$" if anchored else "")


def rules_df(spark: SparkSession, robots_by_host: dict[str, str]) -> DataFrame:
    """DataFrame(host, rule, prefix, pattern_re, wild): one row per rule.

    ``prefix`` is the raw pattern (its octet length is the §2.2.2 precedence
    key); ``pattern_re``/``wild`` carry the pre-compiled regex for patterns
    using ``*``/``$`` — compiled HERE, once per rule, because the rule table
    is hosts-sized while the link stream is crawl-sized.
    """
    rows = [
        (host, rule, pattern, pattern_regex(pattern), pattern_regex(pattern) is not None)
        for host, text in robots_by_host.items()
        for rule, pattern in parse_robots_txt(text)
    ]
    return spark.createDataFrame(
        rows or [],
        "host string, rule string, prefix string, pattern_re string, wild boolean",
    )


def with_allowed(links: DataFrame, rules: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``allowed boolean`` to links(url, host, ...).

    Longest-prefix precedence, Allow wins ties, unmatched ⇒ allowed.
    ``url_col`` selects which column's path the rules match — pass the
    CANONICAL url where available (percent-encoding tricks like
    ``/%64eny/`` must not dodge a ``Disallow: /deny`` rule).

    Plan shape: broadcast the rule table onto the link stream (inner join —
    links on rule-less hosts drop out immediately and stay un-shuffled),
    aggregate the best rule per matched url, then join that verdict set
    back. The verdict set is rule-HIT-sized — in a healthy crawl a small
    minority — so AQE broadcasts it and the big link side never shuffles.
    """
    # a bare-host URL ('https://a.test') parses to PATH '' (not NULL) —
    # both the empty and the missing case mean the root path, which a
    # 'Disallow: /' must match. Rules match the path-and-query (RFC 9309
    # §2.2.2 matches everything after the authority): '$'-anchored rules
    # like '/*.php$' must NOT hit '/x.php?a=1', and query-carrying rules
    # like '/s?q=' must be expressible.
    raw_path = F.try_parse_url(F.col(url_col), F.lit("PATH"))
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    path = F.concat(
        F.when(raw_path.isNull() | (F.length(raw_path) == 0), F.lit("/")).otherwise(
            raw_path
        ),
        F.when(query.isNull() | (F.length(query) == 0), F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    # wildcard rules (*, trailing $) match via their pre-compiled anchored
    # regex; plain prefixes keep the startswith codegen path. Missing
    # wild/pattern_re columns (a hand-built 3-column rule frame) mean no
    # wildcards anywhere.
    if "wild" in rules.columns:
        hit = F.when(
            F.col("wild"), F.regexp_like(F.col("_path"), F.col("pattern_re"))
        ).otherwise(F.col("_path").startswith(F.col("prefix")))
    else:
        hit = F.col("_path").startswith(F.col("prefix"))
    matched = (
        links.select(F.col(url_col), F.col("host"), path.alias("_path"))
        .join(F.broadcast(rules), ["host"])
        .filter(hit)
    )
    # precedence as ONE sortable key: zero-padded prefix length, then an
    # allow-beats-deny flag — longest match wins, Allow wins equal lengths
    # (identical key in the DuckDB oracle, so tie-breaks agree bit-for-bit)
    prec = F.concat(
        F.lpad(F.length("prefix").cast("string"), 4, "0"),
        F.when(F.col("rule") == "allow", F.lit("1")).otherwise(F.lit("0")),
    )
    best = matched.groupBy(url_col).agg(F.max_by(F.col("rule"), prec).alias("_best_rule"))
    return links.join(best, [url_col], "left").withColumn(
        "allowed", F.coalesce(F.col("_best_rule") != "deny", F.lit(True))
    ).drop("_best_rule")


def robots_middleware(rules: DataFrame):
    """Engine middleware (E2 chain): drop links a robots rule denies.

    Usage: ``FrontierEngine(..., middlewares=[robots_middleware(rules)])`` —
    runs after canonicalization, so rules see the canonical host/path.
    """

    def mw(df: DataFrame) -> DataFrame:
        # match on canonical_url: percent-escape normalization has already
        # run, so '/%64eny/x' cannot dodge a 'Disallow: /deny' rule
        return with_allowed(df, rules, url_col="canonical_url").filter(
            F.col("allowed")
        ).drop("allowed")

    return mw


def is_full_ban(rules: list[tuple[str, str]]) -> bool:
    """True iff the host bans everything outright: a ``Disallow: /`` (or
    ``Disallow: *``) with NO Allow carve-outs. Hosts with carve-outs keep
    ``robots_allow=true`` and rely on the path-level middleware — a host-
    level gate must never over-block an allowed subtree."""
    if any(rule == "allow" for rule, _ in rules):
        return False
    return any(rule == "deny" and pattern in ("/", "*") for rule, pattern in rules)


def policies_from_robots(
    spark: SparkSession,
    robots_by_host: dict[str, str],
    default_delay_s: float = 1.0,
    budget: int | None = None,
) -> DataFrame:
    """Per-host politeness policies straight from robots.txt bodies:
    DataFrame(host, robots_allow, delay_s, budget) — the exact frame
    ``DomainMetadata.set_policies`` consumes.

    - ``delay_s`` = the group's ``Crawl-delay`` (token-bucket refill interval:
      tokens accrue at 1/delay_s per crawl-clock second), else
      ``default_delay_s``;
    - ``robots_allow`` = false only for bare full bans (``Disallow: /``, no
      Allow lines) — those hosts are marked SKIPPED_ROBOTS at pop time;
      partial bans stay pop-eligible and are path-filtered by
      ``robots_middleware`` at schedule time;
    - ``budget`` = lifetime fetch cap (None ⇒ unbounded).

    frontera analog: scrapy's RobotsTxtMiddleware + DOWNLOAD_DELAY are
    per-process crawler settings; here the same knobs live in the partitioned
    domain_metadata table so every scheduler partition enforces them.
    """
    rows = []
    for host, text in robots_by_host.items():
        rules, delay = parse_robots(text)
        rows.append(
            (
                host,
                not is_full_ban(rules),
                float(delay if delay is not None else default_delay_s),
                budget,
            )
        )
    return spark.createDataFrame(
        rows or [], "host string, robots_allow boolean, delay_s double, budget long"
    )
