"""Scale-aware blocking for embedding near-dedup (round 5): the
srp_scaled_params operating-point rule that fixes the fixed-parameter
quadratic cliff the sf1 growth bench caught, and the IVF (SemDeDup-style)
blocking path for weak thresholds. Pins the assumptions the catalog gates
rely on: the rule degenerates to exactly (3, 8) at the sf0.01 gate tables,
so dd_embedding_dedup / dd_text_embedding_dedup keep their baked oracle SQL
while exercising the production auto-resolution wiring."""

import math

import pytest
from pyspark.sql import functions as F

from wss_spark.operators import similarity


def _p1(threshold: float) -> float:
    return 1.0 - math.acos(threshold) / math.pi


def test_scaled_params_base_point_at_gate_count():
    """At the sf0.01/sf0.001 table size (500 rows — pinned below) the rule
    must return exactly the (3, 8) operating point the gates' oracle SQL
    bakes in; if either side drifts, the driver hash-mismatches."""
    assert similarity.srp_scaled_params(500, 0.3) == (3, 8)
    assert similarity.srp_scaled_params(500, 0.9) == (3, 8)


def test_gate_table_counts_match_oracle_assumption():
    """The oracle-SQL reuse in dd_embedding_dedup / dd_text_embedding_dedup
    assumes the sf0.01 documents and embeddings tables hold ≤ the count at
    which the rule still returns (3, 8). Pin the actual row counts."""
    import pyarrow.parquet as pq

    for t in ("documents", "embeddings"):
        n = pq.ParquetFile(f"/root/testdata/sf0.01/{t}.parquet").metadata.num_rows
        assert n == 500, (t, n)
        assert similarity.srp_scaled_params(n, 0.3) == (3, 8)
        assert similarity.srp_scaled_params(n, 0.9) == (3, 8)


def test_scaled_params_bucket_size_bounded():
    """The whole point of the rule: expected bucket size n / 2^planes stays
    ≤ target_bucket (until the plane cap), killing the quadratic cliff."""
    for n in (10**3, 10**4, 10**5, 10**6, 5 * 10**6):
        b, _ = similarity.srp_scaled_params(n, 0.9, target_bucket=200)
        assert n / 2**b <= 200, (n, b)


def test_scaled_params_monotone_and_capped():
    prev_b = 0
    for n in (100, 10**3, 10**4, 10**6, 10**9, 10**12):
        b, t = similarity.srp_scaled_params(n, 0.9)
        assert b >= prev_b
        assert 1 <= t <= 64
        assert b <= 24
        prev_b = b


def test_scaled_params_recall_contract():
    """Below the table cap, the scaled point's pair-miss probability
    (1 - p1^b)^L must not exceed the (3, 8) base point's — scaling up n
    must never silently trade recall for speed."""
    for thr in (0.9, 0.8):
        base_miss = (1 - _p1(thr) ** 3) ** 8
        for n in (2000, 5000, 20000, 50000):
            b, t = similarity.srp_scaled_params(n, thr)
            if t < 64:  # cap not hit → contract must hold exactly
                assert (1 - _p1(thr) ** b) ** t <= base_miss * (1 + 1e-9), (n, thr, b, t)


def test_dedup_near_embeddings_auto_equals_pinned_at_gate_scale(spark):
    """On the 500-row gate table the auto-resolved operating point must
    reproduce the pinned (3, 8) keep set bit for bit."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    pinned = {
        r["vec_id"]
        for r in similarity.dedup_near_embeddings(
            emb, 0.3, dim=64, n_planes=3, n_tables=8
        ).select("vec_id").collect()
    }
    auto = {
        r["vec_id"]
        for r in similarity.dedup_near_embeddings(emb, 0.3, dim=64)
        .select("vec_id").collect()
    }
    assert auto == pinned
    emb.unpersist()


def test_ivf_candidates_recall_and_monotonicity(spark):
    """IVF blocking at the gate operating point (mod 31, n_probe=4) must
    recall ≥ 0.85 of the exact cosine-0.3 pairs on the synthetic table (the
    documented number is 0.875), stay a strict subset of exact, and recall
    must be monotone in n_probe."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_pairs(emb, 0.3).collect()
    }
    got = {}
    for n_probe in (2, 4):
        cands = similarity.ivf_candidates(emb, centroid_mod=31, n_probe=n_probe)
        blocked = {
            (r["id_a"], r["id_b"])
            for r in similarity.embedding_near_pairs(
                emb, 0.3, candidates=cands
            ).collect()
        }
        assert blocked <= exact
        got[n_probe] = len(blocked & exact) / len(exact)
    assert got[2] <= got[4]
    assert got[4] >= 0.85, got
    emb.unpersist()


def test_ivf_candidates_empty_centroids_raises(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty centroid"):
        # no vec_id % 7 == 0 row exists
        similarity.ivf_candidates(emb, centroid_mod=7)


def test_dedup_near_embeddings_ivf_drops_exact_dups(spark):
    """An exact-duplicate vector always shares every probed cell with its
    original (identical assignment scores), so the IVF path must drop it
    regardless of cell geometry; dissimilar vectors survive."""
    vecs = [(i, [float((i * 13 + d * 7) % 97 - 48) for d in range(16)])
            for i in range(8)]
    vecs.append((50, list(vecs[2][1])))
    vecs.append((51, list(vecs[5][1])))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    kept = sorted(
        r["vec_id"]
        for r in similarity.dedup_near_embeddings_ivf(
            emb, threshold=0.999, centroid_mod=4, n_probe=2
        ).select("vec_id").collect()
    )
    assert 50 not in kept and 51 not in kept
    assert set(range(8)) <= set(kept)
