"""Seen-store unit tests: append-only wave dirs + segment compaction must
serve byte-identical key sets through every layout (loose waves, committed
segments, mixed, bucket-pruned), ignore uncommitted segments, and respect
the resume watermark."""

import json
import os

from pyspark.sql import functions as F

from wss_spark.crawl import checkpoint


def _keys(spark, wave, n=20, n_buckets=8):
    rows = [
        ((wave * 1000 + i) % n_buckets, wave * 1000 + i, f"https://h/{wave}/{i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "bucket int, url_hash long, canon_url string")


def _collect(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


def test_segment_compaction_preserves_reads(spark, tmp_path):
    root = str(tmp_path / "ck")
    want = []
    for w in range(6):
        df = _keys(spark, w)
        checkpoint.write_seen_keys(root, w, df)
        want += _collect(df.select("bucket", "url_hash", "canon_url"))
    want = sorted(want)

    before = _collect(checkpoint.read_seen_keys(spark, root, 5))
    assert before == want

    assert checkpoint.compact_seen_keys(spark, root, 0, 3)
    assert checkpoint.last_compacted_wave(root) == 3
    after = _collect(checkpoint.read_seen_keys(spark, root, 5))
    assert after == want  # segment + loose waves = identical key set

    # watermark below the segment's hi: the segment must be ignored and the
    # (never-deleted) wave dirs serve the read
    upto2 = _collect(checkpoint.read_seen_keys(spark, root, 2))
    want2 = sorted(
        t for w in range(3) for t in _collect(
            _keys(spark, w).select("bucket", "url_hash", "canon_url"))
    )
    assert upto2 == want2


def test_bucket_pruned_read_matches_filtered_full_read(spark, tmp_path):
    root = str(tmp_path / "ck")
    for w in range(4):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    checkpoint.compact_seen_keys(spark, root, 0, 1)
    full = checkpoint.read_seen_keys(spark, root, 3)
    pruned = checkpoint.read_seen_keys(spark, root, 3, buckets=[1, 5])
    assert _collect(pruned) == _collect(full.filter(F.col("bucket").isin(1, 5)))


def test_uncommitted_segment_ignored(spark, tmp_path):
    root = str(tmp_path / "ck")
    for w in range(3):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    want = _collect(checkpoint.read_seen_keys(spark, root, 2))
    checkpoint.compact_seen_keys(spark, root, 0, 2)
    # simulate a crash before the marker: remove it
    seg = os.path.join(root, "seen_segments", "seg=00000-00002")
    os.remove(os.path.join(seg, "_SEG_COMMIT.json"))
    assert checkpoint.last_compacted_wave(root) == -1
    assert _collect(checkpoint.read_seen_keys(spark, root, 2)) == want

    # re-running the compaction overwrites and commits the same segment
    checkpoint.compact_seen_keys(spark, root, 0, 2)
    assert checkpoint.last_compacted_wave(root) == 2
    assert _collect(checkpoint.read_seen_keys(spark, root, 2)) == want
    with open(os.path.join(seg, "_SEG_COMMIT.json")) as f:
        assert json.load(f)["hi"] == 2


def test_empty_store_reads_none(spark, tmp_path):
    root = str(tmp_path / "ck")
    assert checkpoint.read_seen_keys(spark, root, 10) is None
    os.makedirs(os.path.join(root, "seen_keys"))
    assert checkpoint.read_seen_keys(spark, root, 10) is None


def test_flat_l0_append_reads_identically_to_bucketed(spark, tmp_path):
    """A wave appended flat (n_keys ≤ flat_max_keys: one bucket-sorted file,
    bucket as a data column) must serve the exact same key set, full and
    bucket-pruned, as the bucketed layout."""
    root_flat = str(tmp_path / "flat")
    root_buck = str(tmp_path / "buck")
    for w in range(4):
        df = _keys(spark, w)
        checkpoint.write_seen_keys(root_flat, w, df, n_keys=20)
        checkpoint.write_seen_keys(root_buck, w, df)  # n_keys unknown → bucketed
    # layout really differs
    assert checkpoint._is_flat_wave_dir(
        os.path.join(root_flat, "seen_keys", "wave=00000"))
    assert not checkpoint._is_flat_wave_dir(
        os.path.join(root_buck, "seen_keys", "wave=00000"))
    assert _collect(checkpoint.read_seen_keys(spark, root_flat, 3)) == \
        _collect(checkpoint.read_seen_keys(spark, root_buck, 3))
    assert _collect(checkpoint.read_seen_keys(spark, root_flat, 3, buckets=[1, 5])) == \
        _collect(checkpoint.read_seen_keys(spark, root_buck, 3, buckets=[1, 5]))


def test_compaction_merges_mixed_flat_and_bucketed_waves(spark, tmp_path):
    """Compaction must normalize a mixed window (flat L0 + bucketed waves)
    into one bucketed segment serving the identical key set."""
    root = str(tmp_path / "ck")
    want = []
    for w in range(4):
        df = _keys(spark, w)
        # alternate layouts inside the compaction window
        n_keys = 20 if w % 2 == 0 else None
        checkpoint.write_seen_keys(root, w, df, n_keys=n_keys)
        want += _collect(df.select("bucket", "url_hash", "canon_url"))
    assert checkpoint.compact_seen_keys(spark, root, 0, 3)
    seg = os.path.join(root, "seen_segments", "seg=00000-00003")
    assert os.path.exists(os.path.join(seg, "_SEG_COMMIT.json"))
    # segment output is bucketed regardless of source layout
    assert any(e.startswith("bucket=") for e in os.listdir(seg))
    assert _collect(checkpoint.read_seen_keys(spark, root, 3)) == sorted(want)
    assert _collect(
        checkpoint.read_seen_keys(spark, root, 3, buckets=[2])
    ) == sorted(t for t in want if t[0] == 2)


def test_flat_threshold_zero_forces_bucketed(spark, tmp_path):
    root = str(tmp_path / "ck")
    checkpoint.write_seen_keys(root, 0, _keys(spark, 0), n_keys=20,
                               flat_max_keys=0)
    assert not checkpoint._is_flat_wave_dir(
        os.path.join(root, "seen_keys", "wave=00000"))


def test_segment_marker_records_zones(spark, tmp_path):
    """compact_seen_keys records per-bucket [min, max, n] url_hash zones in
    the commit marker, computed from the WRITTEN segment bytes."""
    root = str(tmp_path / "ck")
    for w in range(3):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    checkpoint.compact_seen_keys(spark, root, 0, 2)
    seg = os.path.join(root, "seen_segments", "seg=00000-00002")
    with open(os.path.join(seg, "_SEG_COMMIT.json")) as f:
        zones = json.load(f)["zones"]
    want = (
        checkpoint.read_seen_keys(spark, root, 2)
        .groupBy("bucket")
        .agg(F.min("url_hash"), F.max("url_hash"), F.count(F.lit(1)))
        .collect()
    )
    assert zones == {
        str(r[0]): [r[1], r[2], r[3]] for r in want
    }


def test_zone_pruned_read_exact_for_antijoin(spark, tmp_path):
    """Zone-map pruning (VERDICT r04 next #4): with probe hash ranges, a
    read may drop whole segment bucket leaves — but it must keep EVERY key
    whose hash falls inside its bucket's probe range (the anti-join
    correctness contract), and it must actually prune when a range
    excludes a zone."""
    root = str(tmp_path / "ck")
    for w in range(4):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    checkpoint.compact_seen_keys(spark, root, 0, 3)
    full = _collect(checkpoint.read_seen_keys(spark, root, 3))

    # probe ranges that cover everything → identical to the bucket-pruned read
    cover = {b: (0, 10**9) for b in range(8)}
    got = _collect(checkpoint.read_seen_keys(
        spark, root, 3, buckets=list(range(8)), probe_ranges=cover))
    assert got == full

    # a range below every stored hash (waves 0..3 → hashes ≥ 0, < 4000;
    # probe (10^7, 2*10^7)) must prune the segment leaves to nothing
    away = {b: (10**7, 2 * 10**7) for b in range(8)}
    pruned = checkpoint.read_seen_keys(
        spark, root, 3, buckets=list(range(8)), probe_ranges=away)
    assert pruned is None or pruned.count() == 0

    # a mixed case: bucket 1's true range, bucket 2 probed far away —
    # bucket 1 keys all present, bucket 2 contributes nothing, and the
    # anti-join result equals the unpruned anti-join for those probes
    mixed = {1: (0, 4000), 2: (10**7, 2 * 10**7)}
    part = checkpoint.read_seen_keys(
        spark, root, 3, buckets=[1, 2], probe_ranges=mixed)
    got_b1 = {t for t in _collect(part) if t[0] == 1}
    want_b1 = {t for t in full if t[0] == 1}
    assert got_b1 == want_b1
    assert all(t[0] != 2 for t in _collect(part))


def test_zone_pruning_ignores_loose_waves_and_legacy_markers(spark, tmp_path):
    """Loose wave dirs carry no zones and must be served unpruned; a
    segment whose marker predates the zones field is likewise unprunable
    (read everything rather than guess)."""
    root = str(tmp_path / "ck")
    for w in range(4):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    checkpoint.compact_seen_keys(spark, root, 0, 1)  # waves 2,3 stay loose
    seg = os.path.join(root, "seen_segments", "seg=00000-00001")
    with open(os.path.join(seg, "_SEG_COMMIT.json")) as f:
        marker = json.load(f)
    del marker["zones"]  # legacy marker format
    with open(os.path.join(seg, "_SEG_COMMIT.json"), "w") as f:
        json.dump(marker, f)
    away = {b: (10**7, 2 * 10**7) for b in range(8)}
    got = _collect(checkpoint.read_seen_keys(
        spark, root, 3, buckets=list(range(8)), probe_ranges=away))
    full = _collect(checkpoint.read_seen_keys(spark, root, 3))
    assert got == full  # nothing prunable → identical to the full read


def test_evict_seen_keys_copy_on_write(spark, tmp_path):
    """Eviction rewrites the committed store minus the evict set; appends
    AFTER the eviction point re-seen the key normally."""
    root = str(tmp_path / "ck")
    all_keys = []
    for w in range(4):
        df = _keys(spark, w)
        checkpoint.write_seen_keys(root, w, df)
        all_keys += _collect(df)
    checkpoint.compact_seen_keys(spark, root, 0, 1)

    evict = _keys(spark, 1, n=5)  # 5 keys of wave 1
    assert checkpoint.evict_seen_keys(spark, root, evict, 3)
    got = _collect(checkpoint.read_seen_keys(spark, root, 3))
    want = sorted(set(all_keys) - set(_collect(evict)))
    assert got == want
    # the full-range revision is the served state; its zones are fresh
    assert checkpoint.last_compacted_wave(root) == 3

    # re-append one evicted key at a later wave: it is seen again
    back = evict.limit(1)
    checkpoint.write_seen_keys(root, 4, back)
    got2 = _collect(checkpoint.read_seen_keys(spark, root, 4))
    assert got2 == sorted(want + _collect(back))

    # a second eviction (same range) lands as the next revision and wins
    assert checkpoint.evict_seen_keys(spark, root, _keys(spark, 2, n=3), 3)
    got3 = _collect(checkpoint.read_seen_keys(spark, root, 3))
    assert got3 == sorted(set(want) - set(_collect(_keys(spark, 2, n=3))))


def test_evict_historical_reads_and_crash_revision(spark, tmp_path):
    """Reads below the eviction watermark still serve the pre-eviction
    (historical) keys; an uncommitted eviction revision is invisible."""
    import shutil

    root = str(tmp_path / "ck")
    for w in range(3):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    pre = _collect(checkpoint.read_seen_keys(spark, root, 1))
    assert checkpoint.evict_seen_keys(spark, root, _keys(spark, 0, n=4), 2)
    # watermark below the eviction point: historical state intact
    assert _collect(checkpoint.read_seen_keys(spark, root, 1)) == pre

    post = _collect(checkpoint.read_seen_keys(spark, root, 2))
    # simulate a crashed second eviction: revision dir without its marker
    crashed = os.path.join(root, "seen_segments", "seg=00000-00002.r1")
    committed = os.path.join(root, "seen_segments", "seg=00000-00002")
    shutil.copytree(committed, crashed)
    os.remove(os.path.join(crashed, "_SEG_COMMIT.json"))
    assert _collect(checkpoint.read_seen_keys(spark, root, 2)) == post


def test_swap_filter_state_atomic_pointer(spark, tmp_path):
    """swap_filter_state writes the new state to the non-live dir and flips
    the manifest pointer; read_state follows the pointer."""
    root = str(tmp_path / "ck")
    f0 = spark.createDataFrame([(1,)], "x int")
    s0 = spark.createDataFrame([(0, b"a", 1)], "bucket int, bitmap binary, count long")
    snap = checkpoint.write_snapshot(root, 0, f0, s0, {})
    s1 = spark.createDataFrame([(0, b"b", 2)], "bucket int, bitmap binary, count long")
    snap2 = checkpoint.swap_filter_state(root, snap, s1)
    assert snap2.manifest["filter_dir"] == "bloom_v2"
    _fr, st = checkpoint.read_state(spark, root, 0)
    assert st.collect()[0]["count"] == 2
    # a second swap alternates back, overwriting the now-dead original dir
    s2 = spark.createDataFrame([(0, b"c", 3)], "bucket int, bitmap binary, count long")
    snap3 = checkpoint.swap_filter_state(root, snap2, s2)
    assert snap3.manifest["filter_dir"] == "bloom"
    _fr, st = checkpoint.read_state(spark, root, 0)
    assert st.collect()[0]["count"] == 3


def test_gc_seen_store_reclaims_shadowed_state(spark, tmp_path):
    """After a committed eviction rewrite, gc removes shadowed segments and
    wave dirs; reads at/above the eviction watermark are unchanged, and
    keys appended after it survive."""
    root = str(tmp_path / "ck")
    for w in range(4):
        checkpoint.write_seen_keys(root, w, _keys(spark, w))
    checkpoint.compact_seen_keys(spark, root, 0, 1)
    # no full-range segment yet: gc must be a no-op
    assert checkpoint.gc_seen_store(root) == {
        "removed_segments": 0, "removed_waves": 0}
    assert checkpoint.read_seen_keys(spark, root, 3) is not None

    checkpoint.evict_seen_keys(spark, root, _keys(spark, 1, n=5), 3)
    checkpoint.write_seen_keys(root, 4, _keys(spark, 4))  # post-evict append
    before = _collect(checkpoint.read_seen_keys(spark, root, 4))

    stats = checkpoint.gc_seen_store(root)
    assert stats["removed_segments"] >= 1   # the narrow seg=00000-00001
    assert stats["removed_waves"] == 4      # waves 0..3; wave 4 survives
    after = _collect(checkpoint.read_seen_keys(spark, root, 4))
    assert after == before
    # a second eviction rewrite at a later watermark still works post-gc
    assert checkpoint.evict_seen_keys(spark, root, _keys(spark, 4, n=2), 4)
    assert len(_collect(checkpoint.read_seen_keys(spark, root, 4))) == len(before) - 2
