"""Per-host politeness scheduling + robots gating (north-rule scheduler).

The reference enforces politeness with per-request sleeps on its single
thread (`独立版/WeiboCommentScrapy.py:184`, `独立版/(using)WeiboUserScrapy.py:542-545`)
— i.e. an implicit serialized per-host queue. The engine's declarative
equivalent: each wave admits at most ``budget`` URLs per host, chosen by a
deterministic priority order; everything else stays queued. Randomized sleep
*durations* are pacing, not semantics (SURVEY.md §7.3), so the budget is the
only scheduling input — same seed list + same budget ⇒ same visit order at
any parallelism.

Skew: the reference's world is one host (weibo.cn ≈ 100% of traffic). A naive
``Window.partitionBy(host)`` rank would send a 10^10-row frontier to ONE task.
Two-phase rank instead:

  phase 1: rank within (host, salt-slice); keep rank ≤ budget.
           Correct pruning: if a row already has ≥ budget better rows in its
           own slice, it cannot be in the host's global top-budget.
           → at most budget × n_salts survivors per host.
  phase 2: exact rank over the survivors only (tiny), keep rank ≤ budget.

This is the same partial→final shape as Spark's hash aggregation, applied to
top-k. ``n_salts`` bounds per-task work at frontier_size/(hosts×n_salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Deterministic frontier priority: config order first, then stage, then page,
# then canonical url as the total-order tiebreak (SURVEY.md §2.6 O4).
ORDER_COLS = ["priority", "seed_order", "stage", "page", "canon_url"]


def _order_by(cols: list[str] | None) -> list[Column]:
    return [F.col(c).asc() for c in (cols or ORDER_COLS)]


def host_budgets(robots: DataFrame, budget: int,
                 wave_seconds: float = 30.0) -> DataFrame:
    """(host, host_budget): the per-host wave budget implied by the host's
    robots ``crawl_delay``. A wave models a fixed ``wave_seconds`` politeness
    window, so a host declaring delay ``d`` admits at most
    ``floor(wave_seconds / d)`` fetches per wave — clamped to
    [1, global budget]: the declared delay can only slow a host below the
    global budget, never raise it, and never starve it outright (the
    reference's analog is per-family fixed sleeps that pace but never block:
    8 s, `独立版/WeiboLikeSpider.py:86`, vs 3 s,
    `独立版/WeiboComPostSpider.py:51`).

    Delays LONGER than a wave are honored too (they cannot fit inside one
    wave's budget): such a host gets ``host_budget = 1`` plus a
    ``host_period = ceil(delay / wave_seconds)`` and is admitted only on
    waves where ``wave % host_period == 0`` (a pure function of (host,
    wave) — stateless, deterministic, simulator-replicable; off-wave urls
    simply defer to the next wave via split_by_budget). Without the
    period, a host declaring Crawl-delay 300 under 30-second waves would
    be fetched every wave — 10× its declared rate.

    Only hosts with a declared POSITIVE delay are emitted — everyone else
    (no robots row, null delay, or the real-world ``Crawl-delay: 0`` meaning
    "no delay") defaults to the global budget at the join (tiny control-plane
    table, broadcast). Filtering ``> 0`` up front also keeps the division
    safe under Spark 4's ANSI mode (delay 0 would otherwise raise
    DIVIDE_BY_ZERO and kill the crawl at startup)."""
    return (
        robots.filter(F.col("crawl_delay") > 0)
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("_delay"))  # most conservative rule
        .select(
            "host",
            F.least(
                F.lit(budget),
                F.greatest(
                    F.lit(1), F.floor(F.lit(float(wave_seconds)) / F.col("_delay"))
                ),
            ).cast("int").alias("host_budget"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_delay") / F.lit(float(wave_seconds))),
            ).cast("int").alias("host_period"),
        )
    )


def per_host_topk(frontier: DataFrame, budget: int, n_salts: int = 32,
                  order_cols: list[str] | None = None,
                  host_col: str = "host",
                  host_budget: DataFrame | None = None,
                  wave: int = 0) -> DataFrame:
    """Admit ≤ ``budget`` rows per host this wave (or the host's own
    ``host_budget`` when given — see :func:`host_budgets`); adds
    ``host_rank``.

    Deterministic: the result set and ranks are a pure function of the data
    (ORDER_COLS ends in canon_url, a key), never of partition layout.

    Per-host budgets are always ≤ the global ``budget``, so the salted
    phase-1 prune at the global budget stays correct — the exact per-host cap
    applies in phase 2 via a broadcast join of the tiny (host, host_budget)
    table.
    """
    order = _order_by(order_cols)
    salt = F.pmod(F.xxhash64(F.col("canon_url"), F.lit(0x9A17)), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order)
    survivors = (
        frontier.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget)
        .drop("_r1")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    ranked = survivors.withColumn("host_rank", F.row_number().over(w2))
    if host_budget is None:
        return ranked.filter(F.col("host_rank") <= budget)
    # host_budgets always emits the column name 'host'; align it with the
    # caller's host_col so a non-default frontier host column still joins
    hb = host_budget.withColumnRenamed("host", host_col)
    if "host_period" not in hb.columns:  # pre-period callers
        hb = hb.withColumn("host_period", F.lit(1))
    # a host whose declared delay exceeds wave_seconds (host_period > 1)
    # admits only on its on-waves (wave % period == 0); off-wave rows
    # defer to the next wave via split_by_budget's anti-join
    on_wave = F.coalesce("host_period", F.lit(1)) <= 1
    on_wave = on_wave | (F.lit(wave) % F.col("host_period") == 0)
    return (
        ranked.join(F.broadcast(hb), on=host_col, how="left")
        .filter(on_wave
                & (F.col("host_rank") <= F.coalesce("host_budget", F.lit(budget))))
        .drop("host_budget", "host_period")
    )


def split_by_budget(frontier: DataFrame, budget: int, n_salts: int = 32,
                    order_cols: list[str] | None = None,
                    host_budget: DataFrame | None = None,
                    broadcast_admitted: bool = True,
                    wave: int = 0) -> tuple[DataFrame, DataFrame]:
    """(admitted, deferred): deferred rows re-enter the next wave unchanged.

    Deferred is computed as an anti-join on canon_url (a key) so the two
    halves partition the frontier exactly. With ``broadcast_admitted`` (the
    default) the admitted side is explicitly broadcast: it is bounded by
    budget × n_hosts per wave, while the frontier side is the 10^10-row table
    — without the hint Catalyst may plan a full shuffle of the frontier just
    to split out the deferred rows (PLANS.md `split_by_budget_deferred`
    proves the BroadcastHashJoin LeftAnti). When n_hosts is itself unbounded
    (a broad-web frontier where budget × n_hosts could exceed the 8 GB
    broadcast limit or driver memory), pass ``broadcast_admitted=False``
    (CrawlConfig.broadcast_admitted) to drop the hint and let
    AQE/autoBroadcastJoinThreshold pick — degrading to a shuffled anti-join
    instead of failing the wave (ADVICE r03 #1).
    """
    admitted = per_host_topk(frontier, budget, n_salts, order_cols,
                             host_budget=host_budget, wave=wave)
    keys = admitted.select("canon_url")
    if broadcast_admitted:
        keys = F.broadcast(keys)
    deferred = frontier.join(keys, on="canon_url", how="left_anti")
    return admitted, deferred


# ---------------------------------------------------------------------------
# robots gating (new design element — the reference has no robots handling;
# required by the north rule)
# ---------------------------------------------------------------------------


def robots_gate(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Keep only frontier rows allowed by the robots rules table.

    ``robots(host, path_prefix, allowed, crawl_delay)``: longest matching
    prefix per (host, url-path) wins; hosts with no rule default to allowed
    (standard robots semantics).

    Shuffle-free by construction: the tiny rules table is pre-aggregated to
    one array of (prefix, allowed) per host, sorted longest-prefix-first,
    broadcast-joined on host, and resolved per row with array higher-order
    functions — the 10^10-row frontier is never re-shuffled for gating.
    """
    rules_by_host = robots.groupBy("host").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.length("path_prefix").alias("plen"),
                        F.col("path_prefix").alias("prefix"),
                        F.col("allowed").alias("allowed"),
                    )
                )
            )
        ).alias("rules")  # sorted by prefix length desc → first match wins
    )
    path = F.regexp_replace(F.col("canon_url"), r"^[a-z][a-z0-9+.-]*://[^/]+", "")
    gated = frontier.withColumn("_path", path).join(
        F.broadcast(rules_by_host), on="host", how="left"
    )
    first_match = F.try_element_at(
        F.filter(
            F.col("rules"), lambda r: F.col("_path").startswith(r["prefix"])
        ),
        F.lit(1),
    )
    allowed = F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
        F.coalesce(first_match["allowed"], F.lit(True))
    )
    return gated.filter(allowed).drop("_path", "rules")
