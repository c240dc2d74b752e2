"""Aggregation / window / sort / set operators (SURVEY.md §2.4-2.7).

Library functions mirroring the reference's stats surface
(`独立版/WeiboDeepAnalyzer.py:548-600` generate_stats,
`独立版/examples_advanced.py` analyses) as declarative DataFrame ops —
Catalyst handles partial aggregation, broadcast choice, and AQE; nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_by_group(df: DataFrame, group_cols: list[str], order_col: str,
                  k: int, ascending: bool = False,
                  tiebreak: list[str] | None = None) -> DataFrame:
    """W1/A2 — deterministic top-k per group: `sorted(...)[:k]` /
    `Counter.most_common(k)` (`独立版/WeiboDeepAnalyzer.py:584-594`).
    Always supply tiebreak key columns so results are order-stable."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def keep_first(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """W2 — keep-first-per-key dedup (`drop_duplicates(keep='first')`,
    `独立版/(using)WeiboUserScrapy.py:447-456`): the row with the smallest
    ``order_cols`` tuple survives."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def count_top_names(df: DataFrame, name_col: str, k: int = 10) -> DataFrame:
    """A2 — ``Counter(names).most_common(k)``
    (`独立版/WeiboDeepAnalyzer.py:584-594`)."""
    return (
        df.groupBy(name_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(name_col).asc())
        .limit(k)
    )


def hour_histogram(df: DataFrame, ts_col: str) -> DataFrame:
    """A5 — activity histogram by hour of day
    (`独立版/examples_advanced.py:104-119`)."""
    return (
        df.groupBy(F.hour(F.col(ts_col)).alias("hour"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("hour")
    )


def length_stats(df: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    """A3/A4 — content length distribution
    (`独立版/examples_advanced.py:122-130`)."""
    ln = F.length(F.col(text_col))
    return (
        df.groupBy(*group_cols)
        .agg(
            F.round(F.avg(ln), 6).alias("avg_len"),
            F.min(ln).alias("min_len"),
            F.max(ln).alias("max_len"),
            F.count("*").alias("cnt"),
        )
        .orderBy(*group_cols)
    )


def ratio_agg(df: DataFrame, group_cols: list[str], predicate: Column,
              out_name: str = "ratio") -> DataFrame:
    """A6 — share of rows matching a predicate per group
    (`独立版/examples_advanced.py:164-169`)."""
    return (
        df.groupBy(*group_cols)
        .agg(F.round(F.avg(F.when(predicate, 1.0).otherwise(0.0)), 6).alias(out_name))
        .orderBy(*group_cols)
    )


def top_influencers(edges: DataFrame, node_col: str, k: int = 3,
                    group_cols: list[str] | None = None) -> DataFrame:
    """Repost-graph analytics over an edge table (the README's
    relationship-network companion, `/root/reference/README.md:24`, whose
    node sizes are repost degrees): degree per node = edge count, then the
    top-k nodes by degree (per ``group_cols`` when given, global otherwise).

    Two shuffles total — a map-side-combinable count and a top-k window over
    the already-aggregated (≪ edges) degree table; the degree groupBy keys on
    the node id so a hot post fans into partial aggregates, never one task.
    """
    keys = [node_col] + list(group_cols or [])
    deg = edges.groupBy(*keys).agg(F.count("*").alias("degree"))
    return topk_by_group(
        deg, list(group_cols or []), "degree", k, tiebreak=[node_col]
    ).withColumnRenamed("rank", "rnk")


def sessionize(df: DataFrame, user_col: str, ts_col: str, id_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization — batch form of the streaming session window
    (SURVEY.md §2.9). New session when the gap to the previous event of the
    same user exceeds ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def running_sum(df: DataFrame, part_cols: list[str], order_cols: list[str],
                value_col: str, out_name: str = "running_sum") -> DataFrame:
    """Analytic frame (rowsBetween) — beyond the reference; standard Spark."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_name, F.sum(F.col(value_col)).over(w))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping_num: int = 85, damping_den: int = 100,
             n_iter: int = 10, scale: int = 10**12) -> DataFrame:
    """Deterministic PageRank over an edge table: (node, rank_fp) with
    ``rank_fp`` the rank in fixed-point units of ``1/scale`` — the
    influence ranking of the repost/relationship network (the
    degree-based `top_influencers` is the reference's analog; PageRank is
    its standard refinement for training-data source weighting).

    ALL arithmetic is 64-bit integer (fixed-point scale, floor division,
    integer damping fraction): long sums are exact and order-independent,
    so the result is bit-identical under any partitioning, core count, or
    engine — an imperative replay of the same recurrence value-oracles it
    (the ann_srp_topk precedent: exact oracle of a deterministic
    definition). Float PageRank would differ in low bits per shuffle
    layout, which a value-hash gate cannot tolerate.

    Recurrence (per iteration, integer ops only):
      contrib(v)   = rank_fp(v) div out_degree(v)   along each edge
      dangling     = Σ rank_fp(v) over nodes with no out-edge
      rank_fp'(u)  = ((scale - d·scale) + d·(Σ contrib + dangling div N·…))
    concretely: base = (scale//N - d(scale//N)) + damped inflow, with
    d(x) = x·damping_num div damping_den.

    Scale shape: one groupBy(src) for degrees, then per iteration one
    equi-join (edges ⋈ ranks, both hash-partitioned on the source node)
    plus one groupBy(dst) long-sum — partial-aggregated map-side. The
    dangling mass is one scalar aggregate per iteration (control-plane).
    Plans stay flat via per-iteration localCheckpoint (the dup_clusters /
    ivf_train_centroids contract).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).persist()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist(); nodes.unpersist()
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    # persisted: consumed TWICE per iteration (the dangling scalar and the
    # contributions join) × n_iter — without the cache the degree
    # aggregation re-runs ~2·n_iter times instead of once
    out_deg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count("*").alias("_deg")
    ).persist()
    init = scale // n
    # (1-d) * scale/N in exact integer form
    teleport = init - (init * damping_num // damping_den)
    ranks = nodes.withColumn("rank_fp", F.lit(init).cast("long"))
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(n_iter):
        with_deg = ranks.join(out_deg, "node", "left")
        # dangling nodes: no out-edges → their whole mass teleports
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).alias("m"))
            .collect()[0]["m"]
        )
        dangling_share = int(dangling) // n
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select(F.col("node").alias("_s"),
                    F.expr("div(rank_fp, _deg)").alias("_c"))
            .join(e, "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("_c").alias("_in"))
        )
        new = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("_in"), F.lit(0))
                 + F.lit(dangling_share)).alias("_inflow"),
            )
            .select(
                "node",
                (F.lit(teleport)
                 + F.expr(f"div(_inflow * {damping_num}, {damping_den})")
                 ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = new
    e.unpersist(); nodes.unpersist(); out_deg.unpersist()
    return ranks
