"""robots.txt parsing as a DataFrame transformation: raw
``(host, robots_txt)`` rows in → the engine's ROBOTS rules table out
(``host, path_prefix, allowed, crawl_delay`` — the table
:func:`politeness.robots_gate` and :func:`politeness.host_budgets`
consume).

The reference crawlers hard-code per-spider pacing instead of reading
robots (`独立版/WeiboLikeSpider.py:86` 8s vs `WeiboComPostSpider.py:51`
3s); a Common-Crawl-style frontier must derive both the allow rules and
the per-host delay from each host's published robots.txt. This module is
that derivation, distributed: the line-interpreter state machine
(user-agent groups accumulate until the first directive; rules attach to
every agent of their group) is expressed as windows over the exploded
line number — one shuffle keyed on host, no Python in the data plane.

Scale shape: robots documents are small and one-per-host, so the explode
is bounded (lines-per-doc), the only exchange is the per-host window
sort, and output cardinality is rules-per-host. At 10^10-URL frontier
scale this runs over the hosts table (millions of rows), not the
frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(raw: DataFrame, agent: str = "*", host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Parse raw robots.txt text into the ROBOTS rules table for ``agent``.

    Semantics implemented (the de-facto subset all major crawlers agree
    on, per RFC 9309):

    - ``#`` comments stripped; keys case-insensitive; values trimmed.
    - Consecutive ``User-agent:`` lines STACK into one group (a directive
      line closes the group; the next user-agent line after a directive
      starts a new group).
    - A group applies if it names ``agent`` exactly or ``*``.
    - ``Allow:`` / ``Disallow:`` emit (path_prefix, allowed) rows; an
      empty ``Disallow:`` value means "allow everything" and emits no
      rule (RFC 9309 §2.2.2).
    - ``Crawl-delay:`` attaches to every rule row of its group (integer
      seconds; non-numeric values ignored). Hosts whose matching groups
      declare no delay get NULL.
    - Hosts with no matching group emit no rows — absent hosts default to
      allowed downstream (robots_gate's left-join semantics).

    Directives from EVERY matching group are kept (exact-agent and ``*``
    groups union, mirroring how robots_gate resolves longest-prefix-first
    over all of a host's rows).
    """
    def _strip(c):
        # F.trim strips only spaces; robots.txt in the wild is CRLF- and
        # tab-ridden, so trim ALL whitespace like Python's str.strip()
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    lines = raw.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\r?\n")).alias("ln", "line"),
    )
    # strip comments + whitespace; split "Key: value" at the FIRST colon.
    # Lines with no colon are no-ops (substring_index would otherwise turn
    # the whole line into a fake key).
    staged = lines.select(
        "host", "ln",
        _strip(F.regexp_replace(F.col("line"), r"#.*$", "")).alias("l"),
    )
    kv = staged.select(
        "host", "ln",
        F.lower(_strip(F.substring_index("l", ":", 1))).alias("key"),
        _strip(F.expr("substring(l, instr(l, ':') + 1)")).alias("value"),
        F.col("l").contains(":").alias("_has_colon"),
    ).filter(F.col("_has_colon") & (F.col("key") != "")).drop("_has_colon")

    is_ua = F.col("key") == F.lit("user-agent")
    w = Window.partitionBy("host").orderBy("ln")
    # group id: a user-agent line whose PREVIOUS parsed line was not a
    # user-agent line starts a new group (stacked ua lines share the group)
    starts = F.when(
        is_ua & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent"),
        F.lit(1),
    ).otherwise(F.lit(0))
    kv = kv.withColumn("gid", F.sum(starts).over(w))

    # which groups apply to this agent
    groups = (
        kv.filter(is_ua)
        .filter(F.lower(F.col("value")).isin(agent.lower(), "*"))
        .select("host", "gid")
        .distinct()
    )
    directives = kv.filter(~is_ua).join(groups, ["host", "gid"])

    delay = (
        directives.filter(F.col("key") == "crawl-delay")
        .select(
            "host", "gid",
            # try_cast: non-numeric delays ("soon") are ignored, not ANSI
            # cast errors; non-positive delays are meaningless pacing and
            # treated as absent
            F.col("value").try_cast("int").alias("crawl_delay"),
        )
        .filter(F.col("crawl_delay") > 0)
        .groupBy("host", "gid")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
    rules = directives.filter(
        F.col("key").isin("allow", "disallow")
        & ~((F.col("key") == "disallow") & (F.col("value") == ""))
    ).select(
        "host", "gid", "ln",
        F.col("value").alias("path_prefix"),
        (F.col("key") == "allow").alias("allowed"),
    )
    return (
        rules.join(delay, ["host", "gid"], "left")
        .select("host", "path_prefix", "allowed",
                F.col("crawl_delay").cast("int").alias("crawl_delay"))
        .distinct()
    )


def parse_sitemaps(raw: DataFrame, host_col: str = "host",
                   txt_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) rows from ``Sitemap:`` directives — host-wide
    and user-agent-independent per RFC 9309 §2.3 (they may appear anywhere
    in the file, outside any group), which is why this is a separate
    function from :func:`parse_robots` rather than a rule kind. The output
    is the seed-discovery side channel a production frontier unions into
    its seed list."""
    staged = raw.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(txt_col), r"\r?\n")).alias("line"),
    ).select(
        "host",
        F.regexp_replace(
            F.regexp_replace(F.col("line"), r"#.*$", ""), r"^\s+|\s+$", ""
        ).alias("l"),
    )
    return (
        staged.select(
            "host",
            F.lower(F.regexp_replace(
                F.substring_index("l", ":", 1), r"^\s+|\s+$", "")).alias("key"),
            F.regexp_replace(
                F.expr("substring(l, instr(l, ':') + 1)"),
                r"^\s+|\s+$", "").alias("sitemap_url"),
            # same no-colon guard as parse_robots: a bare line reading
            # 'sitemap' must not become a bogus url row
            F.col("l").contains(":").alias("_has_colon"),
        )
        .filter(F.col("_has_colon")
                & (F.col("key") == "sitemap") & (F.col("sitemap_url") != ""))
        .select("host", "sitemap_url")
        .distinct()
    )


def sitemap_locs(pages: DataFrame, url_col: str = "url",
                 xml_col: str = "xml") -> DataFrame:
    """(sitemap_url, loc) rows from fetched sitemap XML documents — both
    urlset entries (``<url><loc>…``) and sitemap-index entries
    (``<sitemap><loc>…``, nested sitemaps to fetch next). Together with
    :func:`parse_sitemaps` this closes the seed-discovery chain:
    robots.txt → sitemap urls → fetch → loc extraction → frontier seeds.

    JVM-side regexp extraction (sitemap XML is machine-generated and flat;
    a full XML parse buys nothing here), zero shuffles — a pure projection
    + explode bounded by locs-per-sitemap (50k by protocol limit)."""
    locs = F.expr(rf"regexp_extract_all({xml_col}, '<loc>\\s*([^<]*?)\\s*</loc>', 1)")
    raw = (
        pages.select(F.col(url_col).alias("sitemap_url"), locs.alias("_locs"))
        .select("sitemap_url", F.explode("_locs").alias("loc"))
        .filter(F.col("loc") != "")
    )
    # sitemap locs are XML-escaped (&amp; in query strings is mandatory);
    # unescape the five predefined entities, &amp; LAST so sequences like
    # &amp;lt; decode to the literal '&lt;' rather than '<'
    u = F.col("loc")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        u = F.replace(u, F.lit(ent), F.lit(ch))
    return raw.select("sitemap_url", u.alias("loc"))
