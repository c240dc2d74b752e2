"""Cuckoo-filter seen store (crawl/cuckoo.py): membership contract (no
false negatives, low FP), copy-accurate deletion — the capability the bloom
variant lacks — overflow-stash degradation, partition-invariant state bytes,
and crawl-order equivalence when the frontier runs under
``seen_filter="cuckoo"`` (the north rule's "bloom/cuckoo" alternative)."""

import pytest
from pyspark.sql import functions as F

from wss_spark.crawl import bloom, cuckoo
from wss_spark.crawl.frontier import CrawlConfig, run_crawl, visit_order
from wss_spark.synth import build_pages_df, seed_list

N_BUCKETS = 8
N_SLOTS = 1 << 10
WIDTH = 4


def _urls(spark, prefix, n, n_buckets=N_BUCKETS):
    return bloom.with_hash_cols(
        spark.createDataFrame(
            [(f"https://weibo.cn/comment/{prefix}{i}",) for i in range(n)],
            "canon_url string",
        ),
        n_buckets=n_buckets,
    )


def test_cuckoo_membership_no_false_negatives(spark):
    df = _urls(spark, "x", 500)
    state = cuckoo.update(cuckoo.empty_state(spark, N_BUCKETS), df, N_SLOTS, WIDTH)
    flagged = cuckoo.prefilter(df, state, N_SLOTS, WIDTH)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0

    # 16-bit fingerprints: FP odds per probe ~2*WIDTH/2^16, so 500 fresh
    # urls should essentially never collide (bound generously)
    fresh = _urls(spark, "y", 500)
    fp = cuckoo.prefilter(fresh, state, N_SLOTS, WIDTH).filter(
        F.col("maybe_seen")
    ).count()
    assert fp <= 2
    assert state.agg(F.sum("count")).first()[0] == 500


def test_cuckoo_incremental_update(spark):
    a = _urls(spark, "a", 40)
    b = _urls(spark, "b", 40)
    st = cuckoo.update(cuckoo.empty_state(spark, N_BUCKETS), a, N_SLOTS, WIDTH)
    st = cuckoo.update(st, b, N_SLOTS, WIDTH)
    both = a.unionByName(b)
    assert cuckoo.prefilter(both, st, N_SLOTS, WIDTH).filter(
        ~F.col("maybe_seen")
    ).count() == 0
    assert st.agg(F.sum("count")).first()[0] == 80


def test_cuckoo_delete_restores_crawlability(spark):
    """Deleting a seen url's entry makes the prefilter pass it again (the
    eviction path of a refresh crawl) without disturbing other members."""
    df = _urls(spark, "d", 500).persist()
    st = cuckoo.update(cuckoo.empty_state(spark, N_BUCKETS), df, N_SLOTS, WIDTH)
    evict = df.filter(F.col("canon_url").rlike("d1[0-9]$"))  # d10..d19
    keep = df.join(evict.select("canon_url"), "canon_url", "left_anti")
    st2 = cuckoo.delete(st, evict, N_SLOTS, WIDTH)

    # evicted urls are gone (16-bit fps at this density: collisions ~0,
    # and a collision could only keep maybe_seen=True, never corrupt keep)
    gone = cuckoo.prefilter(evict, st2, N_SLOTS, WIDTH)
    assert gone.filter(F.col("maybe_seen")).count() <= 1
    # every remaining member still has its copy: NO false negatives
    still = cuckoo.prefilter(keep, st2, N_SLOTS, WIDTH)
    assert still.filter(~F.col("maybe_seen")).count() == 0
    assert st2.agg(F.sum("count")).first()[0] == 500 - evict.count()
    df.unpersist()


def test_cuckoo_copy_semantics(spark):
    """Two inserts of the same key store two copies; each delete removes
    exactly one — the standard cuckoo-filter multiset contract."""
    one = _urls(spark, "c", 1)
    st = cuckoo.update(cuckoo.empty_state(spark, N_BUCKETS), one, N_SLOTS, WIDTH)
    st = cuckoo.update(st, one, N_SLOTS, WIDTH)
    assert st.agg(F.sum("count")).first()[0] == 2
    st = cuckoo.delete(st, one, N_SLOTS, WIDTH)
    assert cuckoo.prefilter(one, st, N_SLOTS, WIDTH).filter(
        F.col("maybe_seen")
    ).count() == 1
    st = cuckoo.delete(st, one, N_SLOTS, WIDTH)
    assert cuckoo.prefilter(one, st, N_SLOTS, WIDTH).filter(
        F.col("maybe_seen")
    ).count() == 0
    assert st.agg(F.sum("count")).first()[0] == 0
    # deleting an absent key is a no-op on the table, not a corruption
    st = cuckoo.delete(st, one, N_SLOTS, WIDTH)
    assert st.agg(F.sum("count")).first()[0] == 0


def test_cuckoo_overflow_stash_no_false_negatives(spark):
    """A saturated table degrades to the stash, never to a false negative:
    8x2=16 slots per bucket, 300 inserts into ONE bucket."""
    df = _urls(spark, "o", 300, n_buckets=1)
    st = cuckoo.update(cuckoo.empty_state(spark, 1), df, 8, 2, max_kicks=20)
    row = st.collect()[0]
    assert len(row["stash"]) // 8 >= 300 - 16  # most entries stashed
    assert cuckoo.prefilter(df, st, 8, 2).filter(~F.col("maybe_seen")).count() == 0
    # stash entries delete like table entries
    st2 = cuckoo.delete(st, df, 8, 2)
    assert st2.agg(F.sum("count")).first()[0] == 0
    assert cuckoo.prefilter(df, st2, 8, 2).filter(F.col("maybe_seen")).count() == 0


def test_cuckoo_state_bytes_partition_invariant(spark):
    """The state tables are a pure function of the key SET: update order
    inside a bucket is pinned by the url_hash sort, so any input
    partitioning yields byte-identical tables and stashes."""
    df = _urls(spark, "p", 400)
    a = cuckoo.update(
        cuckoo.empty_state(spark, N_BUCKETS), df.repartition(1), N_SLOTS, WIDTH
    )
    b = cuckoo.update(
        cuckoo.empty_state(spark, N_BUCKETS), df.repartition(13), N_SLOTS, WIDTH
    )
    rows_a = {r["bucket"]: (r["table"], r["stash"], r["count"]) for r in a.collect()}
    rows_b = {r["bucket"]: (r["table"], r["stash"], r["count"]) for r in b.collect()}
    assert rows_a == rows_b


def test_crawl_order_identical_under_cuckoo(spark, tmp_path):
    """seen_filter='cuckoo' is a prefilter in front of the same exact
    anti-join: crawl order and the final seen set must match the bloom
    run bit-for-bit."""
    pages = build_pages_df(spark, 8, seed=42).cache()
    pages.count()
    seeds = seed_list(8, seed=42)
    base = CrawlConfig(budget=5, n_buckets=N_BUCKETS, m_bits=1 << 16,
                       checkpoint_dir=str(tmp_path / "bloom"))
    ck = CrawlConfig(budget=5, n_buckets=N_BUCKETS, seen_filter="cuckoo",
                     cuckoo_slots=1 << 12,
                     checkpoint_dir=str(tmp_path / "cuckoo"))
    r_bloom = run_crawl(spark, pages, seeds, base)
    r_ck = run_crawl(spark, pages, seeds, ck)
    assert visit_order(r_ck.fetch_log) == visit_order(r_bloom.fetch_log)
    seen_b = {r[0] for r in r_bloom.seen.select("canon_url").collect()}
    seen_c = {r[0] for r in r_ck.seen.select("canon_url").collect()}
    assert seen_c == seen_b
    pages.unpersist()


def test_resume_rejects_filter_mismatch(spark, tmp_path):
    pages = build_pages_df(spark, 4, seed=7).cache()
    seeds = seed_list(4, seed=7)
    cfg = CrawlConfig(budget=5, n_buckets=N_BUCKETS, max_waves=2,
                      checkpoint_every=1, checkpoint_dir=str(tmp_path / "ck"))
    run_crawl(spark, pages, seeds, cfg)
    bad = CrawlConfig(budget=5, n_buckets=N_BUCKETS, seen_filter="cuckoo",
                      checkpoint_dir=str(tmp_path / "ck"))
    with pytest.raises(ValueError, match="seen_filter"):
        run_crawl(spark, pages, seeds, bad, resume=True)
    pages.unpersist()


def test_unknown_seen_filter_rejected(spark):
    with pytest.raises(ValueError, match="seen_filter"):
        run_crawl(
            spark, build_pages_df(spark, 1, seed=1), seed_list(1, seed=1),
            CrawlConfig(seen_filter="xor"),
        )


@pytest.mark.parametrize("filter_kind", ["bloom", "cuckoo"])
def test_evict_and_refresh_generation(spark, tmp_path, filter_kind):
    """evict_urls forces chosen urls back into crawlability: the next
    continue_seen generation re-fetches exactly them — their discovered
    children stay seen. Works under both filter variants (cuckoo keeps the
    prefilter tight via delete; bloom falls back to the exact anti-join)."""
    from wss_spark.crawl.recrawl import evict_urls

    pages = build_pages_df(spark, 8, seed=42).cache()
    pages.count()
    seeds = seed_list(8, seed=42)
    cfg = CrawlConfig(
        budget=5, n_buckets=N_BUCKETS, seen_filter=filter_kind,
        cuckoo_slots=1 << 12, m_bits=1 << 16,
        checkpoint_dir=str(tmp_path / filter_kind),
    )
    r1 = run_crawl(spark, pages, seeds, cfg)
    order1 = visit_order(r1.fetch_log)
    assert len(order1) > 10
    targets = order1[:3]

    assert evict_urls(spark, cfg.checkpoint_dir, targets, cfg) == 3
    # idempotent: the keys are already gone
    assert evict_urls(spark, cfg.checkpoint_dir, targets, cfg) == 0

    # fetch_log of a continue_seen generation unions ALL committed waves —
    # scope the assertions to the waves this generation ran
    w1 = r1.fetch_log.agg(F.max("wave")).first()[0]
    r2 = run_crawl(spark, pages, targets, cfg, continue_seen=True)
    gen2 = r2.fetch_log.filter(F.col("wave") > w1)
    refetched = sorted(r["url"] for r in gen2.select("url").collect())
    assert refetched == sorted(targets)
    assert gen2.filter(F.col("status") != 200).count() == 0
    # and the refresh re-seens them: a further generation admits nothing
    w2 = r2.fetch_log.agg(F.max("wave")).first()[0]
    r3 = run_crawl(spark, pages, targets, cfg, continue_seen=True)
    assert r3.fetch_log.filter(F.col("wave") > w2).count() == 0
    pages.unpersist()


def test_evict_urls_rejects_config_mismatch_before_mutation(spark, tmp_path):
    """evict_urls under seen_filter='cuckoo' on a BLOOM snapshot must fail
    up front, leaving the exact seen store untouched."""
    from wss_spark.crawl import checkpoint
    from wss_spark.crawl.recrawl import evict_urls

    pages = build_pages_df(spark, 4, seed=11).cache()
    seeds = seed_list(4, seed=11)
    cfg = CrawlConfig(budget=5, n_buckets=N_BUCKETS, max_waves=2,
                      checkpoint_dir=str(tmp_path / "ck"))
    r = run_crawl(spark, pages, seeds, cfg)
    target = visit_order(r.fetch_log)[:1]
    snap = checkpoint.latest_snapshot(cfg.checkpoint_dir)
    before = checkpoint.read_seen_keys(spark, cfg.checkpoint_dir, snap.wave).count()
    bad = CrawlConfig(budget=5, n_buckets=N_BUCKETS, seen_filter="cuckoo",
                      checkpoint_dir=cfg.checkpoint_dir)
    with pytest.raises(ValueError, match="bloom state"):
        evict_urls(spark, cfg.checkpoint_dir, target, bad)
    after = checkpoint.read_seen_keys(spark, cfg.checkpoint_dir, snap.wave).count()
    assert after == before
    pages.unpersist()
