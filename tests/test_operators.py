"""Unit tests for the operator library (dedup / similarity / textstats /
analytics / multimodal) on tiny hand-checked inputs."""

import pytest
from pyspark.sql import functions as F

from wss_spark.operators import analytics, dedup, multimodal, similarity, textstats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    docs = _docs(spark, ["a b c", "a  B c", "x y z", "a b c"])  # 0,1,3 same normalized? 1 has B
    groups = dedup.exact_dup_groups(docs).collect()
    by_hash = {g["keep_id"]: g["dup_count"] for g in groups}
    # "a b c" (0,3) collapse; "a b c"≠"a B c" (case-normalized → equal!)
    # normalize lowercases: 0,1,3 are all "a b c"
    assert by_hash == {0: 3, 2: 1}
    kept = dedup.dedup_exact(docs).select("doc_id").collect()
    assert sorted(r[0] for r in kept) == [0, 2]


def test_shingles_and_jaccard(spark):
    docs = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely different words entirely here now",
        ],
    )
    sh = dedup.shingles(docs, 3)
    pairs = dedup.jaccard_pairs(sh, threshold=0.3).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["doc_a"], p["doc_b"]) == (0, 1)
    # 7 shingles each, 6 shared → 6/8
    assert abs(p["jaccard"] - 0.75) < 1e-9


def test_minhash_lsh_finds_duplicates(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [base, base, "one two three four five six seven eight nine ten"])
    pairs = dedup.minhash_lsh_dedup(docs, n=3, k=8, threshold=0.9).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(0, 1, 1.0)]


def test_simhash_identity_and_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [base, base, "unrelated totally other words list here"])
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sims[0] == sims[1]
    assert 0 <= sims[0] < (1 << dedup.SIMHASH_BITS)
    pairs = dedup.simhash_near_pairs(dedup.simhash(docs), max_hamming=0).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [(0, 1, 0)]


def test_brute_force_cosine(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # farthest from 0
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    rows = got.orderBy("rank").collect()
    assert [r["nid"] for r in rows] == [1, 2, 3]
    assert rows[0]["sim"] > 0.99


def test_srp_recall_vs_exact(spark):
    """VERDICT r01 item 3: the approximate ANN path needs a recall assertion
    against the exact baseline (it has no value oracle by design)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(emb, q, k=5).select("qid", "nid").collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in similarity.srp_topk(
            emb, q, k=5, dim=64, n_planes=4, n_tables=8, n_probe_bits=1
        ).select("qid", "nid").collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"SRP recall@5 too low: {recall}"
    emb.unpersist()


def test_embedding_near_pairs_blocked_path(spark):
    """The SRP-blocked scale path of embedding near-dup must (a) be a strict
    subset of the exact result and (b) recall most of it."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_pairs(emb, 0.3).collect()
    }
    # wide buckets (3 planes): the synthetic embeddings are near-uniform, so
    # cosine-0.3 "neighbors" sit close to the bulk distribution — real
    # text-embedding corpora cluster far more and block far better
    cands = similarity.srp_candidates(emb, dim=64, n_planes=3, n_tables=8)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_pairs(emb, 0.3, candidates=cands).collect()
    }
    assert blocked <= exact
    assert exact  # threshold yields a non-trivial set on this data
    assert len(blocked) / len(exact) >= 0.6, (len(blocked), len(exact))
    emb.unpersist()


def test_srp_recalls_identical_vector(spark):
    vecs = [(i, [float((i * 17 + d * 3) % 101 - 50) for d in range(16)]) for i in range(20)]
    vecs.append((99, list(vecs[0][1])))  # exact duplicate of vec 0
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = similarity.srp_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=3, dim=16, n_planes=6, n_tables=4
    ).collect()
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert by_rank and by_rank[0]["nid"] == 99 and by_rank[0]["sim"] == 1.0


def test_ivf_topk_recall_and_invariance(spark):
    """The IVF coarse-quantizer ANN path: recall@5 vs the exact baseline,
    candidates a strict subset relationship is NOT required (probing may
    miss), but the result must be identical under a different partition
    layout (pure function of data, the crawl-ordering rule applied to ANN),
    and an exact duplicate vector must always be recalled (same cell)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(emb, q, k=5).select("qid", "nid").collect()
    }
    got = similarity.ivf_topk(emb, q, k=5, centroid_mod=63, n_probe=3)
    approx = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    recall = len(exact & approx) / len(exact)
    # near-uniform synthetic embeddings are IVF's worst case (neighbors
    # spread across cells); real text-embedding corpora cluster and need
    # fewer probes for the same recall
    assert recall >= 0.7, f"IVF recall@5 too low: {recall}"

    one_probe = similarity.ivf_topk(emb, q, k=5, centroid_mod=63, n_probe=1)
    r1 = {(r["qid"], r["nid"]) for r in one_probe.select("qid", "nid").collect()}
    assert len(exact & r1) <= len(exact & approx)  # recall monotone in n_probe

    relaid = similarity.ivf_topk(
        emb.repartition(7, "vec_id"), q.coalesce(1), k=5, centroid_mod=63, n_probe=3
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, relaid.collect()))
    emb.unpersist()


def test_ivf_train_centroids(spark):
    """Lloyd's trainer: the trained centroid table plugs into ivf_topk and
    holds the recall floor, keeps the centroid count and dimensionality of
    the deterministic init (empty cells fall back to their previous
    centroid), and is a pure function of data — identical under a different
    partition layout."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 10)
    trained = similarity.ivf_train_centroids(emb, centroid_mod=63, n_iter=2)

    n_init = emb.filter((F.col("vec_id") % 63) == 0).count()
    rows = trained.collect()
    assert len(rows) == n_init
    dim = len(emb.first()["embedding"])
    assert all(len(r["embedding"]) == dim for r in rows)

    exact = {
        (r["qid"], r["nid"])
        for r in similarity.brute_force_topk(emb, q, k=5).select("qid", "nid").collect()
    }
    got = similarity.ivf_topk(emb, q, k=5, n_probe=3, centroids=trained)
    approx = {(r["qid"], r["nid"]) for r in got.select("qid", "nid").collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"trained-IVF recall@5 too low: {recall}"

    relaid = similarity.ivf_train_centroids(
        emb.repartition(7, "vec_id"), centroid_mod=63, n_iter=2
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, relaid.collect()))
    emb.unpersist()


def test_ivf_empty_centroids_raises(spark):
    """An id space that misses the sample residue class must raise, not
    silently return 0 rows for every query / an empty centroid frame."""
    vecs = [(i, [float(d) for d in range(8)]) for i in range(1, 20)]  # no id % 31 == 0
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="centroid"):
        similarity.ivf_topk(emb, emb.limit(1), k=3, centroid_mod=31).collect()
    with pytest.raises(ValueError, match="centroid"):
        similarity.ivf_train_centroids(emb, centroid_mod=31)


def test_ivf_recalls_identical_vector(spark):
    vecs = [(i, [float((i * 13 + d * 7) % 97 - 48) for d in range(16)]) for i in range(40)]
    vecs.append((99, list(vecs[5][1])))  # exact duplicate of vec 5
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") == 5), k=3, centroid_mod=7, n_probe=2
    ).collect()
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert by_rank and by_rank[0]["nid"] == 99 and by_rank[0]["sim"] == 1.0


def test_textstats_token_counts(spark):
    docs = _docs(spark, ["Hello, world! 42 times", ""])
    rows = {r["doc_id"]: r for r in textstats.token_counts(docs).collect()}
    assert rows[0]["ws_tokens"] == 4
    assert rows[0]["word_tokens"] == 4  # hello world 42 times
    assert rows[1]["ws_tokens"] == 0


def test_textstats_lang_id(spark):
    docs = _docs(
        spark,
        [
            "the cat and the dog of the house",
            "der hund und die katze und der vogel",
            "zzz qqq xxx",
        ],
    )
    rows = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(docs).collect()}
    assert rows[0] == "en" and rows[1] == "de" and rows[2] == "und"


def test_analytics_keep_first_and_topk(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "k string, id int, v double",
    )
    first = analytics.keep_first(df, ["k"], ["id"]).collect()
    assert {(r["k"], r["id"]) for r in first} == {("a", 1), ("b", 4)}
    top = analytics.topk_by_group(df, ["k"], "v", 1, tiebreak=["id"]).collect()
    assert {(r["k"], r["id"]) for r in top} == {("a", 2), ("b", 4)}


def test_analytics_sessionize(spark):
    rows = [
        (1, "2020-01-01 10:00:00", 1),
        (1, "2020-01-01 10:10:00", 2),   # same session (gap 10m)
        (1, "2020-01-01 11:30:00", 3),   # new session (gap 80m)
        (2, "2020-01-01 10:00:00", 4),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, event_id int").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in analytics.sessionize(df, "user_id", "ts", "event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_multimodal_resize_and_frames(spark):
    """Resize + frame-sample plumbing: only the right media kind transfers,
    output is deterministic across partition layouts, frame fan-out is
    bounded by duration and max_frames, and the real decode path stays
    codec-gated."""
    import pytest as _pytest

    media = multimodal.synth_media_df(spark, 30, seed=9).cache()
    rz = multimodal.resize_images(media, 32, 24)
    rows = {r["media_id"]: r for r in rz.collect()}
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(r["out_width"] == 32 and r["out_height"] == 24
               and len(r["payload"]) == 32 * 24 // 8 for r in rows.values())
    again = {r["media_id"]: r["content_sha"]
             for r in multimodal.resize_images(media.repartition(7), 32, 24).collect()}
    assert again == {k: v["content_sha"] for k, v in rows.items()}

    fr = multimodal.sample_frames(media, every_ms=1000, max_frames=4)
    per = {r["media_id"]: r["n"] for r in
           fr.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durs = {r["media_id"]: r["duration_ms"] for r in
            media.filter(F.col("kind") == "video").collect()}
    assert set(per) == set(durs)
    for mid, n in per.items():
        want = min(4, (durs[mid] or 0) // 1000 + 1) if durs[mid] else 1
        assert n == want
    idx = {(r["media_id"], r["frame_index"]) for r in fr.collect()}
    assert all((m, k) in idx for m, n in per.items() for k in range(n))

    with _pytest.raises(multimodal.DecoderUnavailable):
        multimodal.real_decode_image(b"x")
    media.unpersist()


def test_multimodal_pipeline(spark):
    media = multimodal.synth_media_df(spark, 50, seed=3)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    again = {r["media_id"]: r["feature_hash"] for r in multimodal.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature_hash"] for r in rows)  # deterministic
    dup = multimodal.media_dedup(media.unionByName(media))
    assert dup.agg(F.max("dup_count")).first()[0] == 2


def test_dup_clusters_components(spark):
    # two components: {1,2,3} via chain 1-2, 2-3; {7,9}; pointer-jump must
    # collapse the chain to rep=1 even though 3 never touches 1 directly
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_dup_clusters_long_chain_converges(spark):
    # a 12-node path graph: diameter 11 > default plain-propagation budget
    # unless pointer jumping compresses — still must reach rep=0 everywhere
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = dedup.dup_clusters(pairs, max_iter=8).collect()
    assert {r["cluster_rep"] for r in got} == {0}
    assert {r["doc_id"] for r in got} == set(range(12))


def test_dedup_by_clusters_and_end_to_end(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            base,                                    # 0: rep of {0,1}
            base,                                    # 1: dropped
            "one two three four five six seven",     # 2: singleton, kept
            base + " extra",                         # 3: near-dup of 0 → dropped
        ],
    )
    kept = dedup.dedup_near(docs, n=3, k=8, threshold=0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 2]
    # composition invariant: pairs → clusters → keep set keeps exactly the
    # min id of every component plus all unpaired docs
    pairs = dedup.minhash_lsh_dedup(docs, n=3, k=8, threshold=0.5)
    clusters = dedup.dup_clusters(pairs)
    kept2 = dedup.dedup_by_clusters(docs, clusters).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept2) == [0, 2]

    # id_col is plumbed through the WHOLE pipeline: a frame keyed on
    # post_id with no doc_id column dedups identically
    renamed = docs.withColumnRenamed("doc_id", "post_id")
    kept3 = dedup.dedup_near(renamed, n=3, k=8, threshold=0.5,
                             id_col="post_id").collect()
    assert sorted(r["post_id"] for r in kept3) == [0, 2]


def test_annotate_matches_joined_building_blocks(spark):
    """corpus.annotate (one zero-shuffle projection) must equal joining
    lang_id + quality_score back onto the docs."""
    from wss_spark.operators import corpus

    docs = _docs(spark, [
        "the cat and the dog of the house",      # en markers
        "der hund und die katze und der vogel",  # de markers
        "这是的了是的了一个测试",                  # zh markers
        "qqq zzz",                               # no markers → und
        "",                                      # empty
    ])
    got = {r["doc_id"]: (r["lang_pred"], r["quality"])
           for r in corpus.annotate(docs).collect()}
    want_lang = {r["doc_id"]: r["lang_pred"]
                 for r in textstats.lang_id(docs).collect()}
    want_q = {r["doc_id"]: r["quality"]
              for r in textstats.quality_score(docs).collect()}
    assert got == {i: (want_lang[i], want_q[i]) for i in want_lang}
    assert got[0][0] == "en" and got[1][0] == "de" and got[2][0] == "zh"
    assert got[3][0] == "und"
    # annotate keeps every input column
    assert set(corpus.annotate(docs).columns) == {"doc_id", "text",
                                                  "lang_pred", "quality"}


def test_clean_corpus_stages(spark):
    """Every pipeline stage drops exactly what it should: lang filter,
    quality filter, exact dedup, near-dedup."""
    from wss_spark.operators import corpus

    base = "the alpha and the beta of the gamma delta epsilon zeta eta"
    docs = _docs(spark, [
        base,                        # 0: kept (rep of {0,1,3})
        base,                        # 1: exact dup of 0 → dropped
        "der hund und die katze",    # 2: de → dropped by lang filter
        base + " extra",             # 3: near-dup of 0 → dropped
        "the one and the two of the three four five six seven",  # 4: kept
    ])
    kept = corpus.clean_corpus(docs, langs=("en",), min_quality=0.0,
                               n=3, k=8, threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [0, 4]
    # survivors carry their annotations
    row = {r["doc_id"]: r for r in kept.collect()}
    assert row[0]["lang_pred"] == "en" and 0.0 <= row[0]["quality"] <= 1.0
    # a min_quality above every score empties the corpus before dedup
    assert corpus.clean_corpus(docs, langs=("en",), min_quality=1.01).count() == 0


def test_dup_clusters_fuzz_vs_union_find(spark):
    """Seeded fuzz: random pair sets (chains, cliques, stars, self-loops,
    duplicates, reversed pairs) — hash-min label propagation must produce
    exactly the union-find components with min-id representatives."""
    import random

    r = random.Random(20260818)
    pairs = set()
    for _ in range(300):
        kind = r.random()
        if kind < 0.3:   # chain segment
            a = r.randrange(200); pairs.add((a, a + 1))
        elif kind < 0.5:  # star
            hub = r.randrange(0, 200, 25); pairs.add((hub, r.randrange(300)))
        elif kind < 0.7:  # clique-ish
            base = r.randrange(250); pairs.add((base, base + r.randint(1, 5)))
        elif kind < 0.8:  # self-loop
            a = r.randrange(300); pairs.add((a, a))
        else:             # far edge / reversed duplicates
            a, b = r.randrange(300), r.randrange(300)
            pairs.add((max(a, b), min(a, b)))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {v: find(v) for v in parent}

    df = spark.createDataFrame(sorted(pairs), "doc_a long, doc_b long")
    got = {r2["doc_id"]: r2["cluster_rep"]
           for r2 in dedup.dup_clusters(df).collect()}
    # min-id rep: path-compress want to the true minimum of each component
    comp = {}
    for v, root in want.items():
        comp.setdefault(find(root), []).append(v)
    want_min = {v: min(members)
                for root, members in comp.items() for v in members}
    assert got == want_min


def test_pagerank(spark):
    """Integer fixed-point PageRank: bit-identical across partition
    layouts, hub gets max rank, mass is conserved up to floor-division
    loss, empty input yields an empty typed frame."""
    from wss_spark.synth import expected_pagerank, pagerank_edges

    edges = spark.createDataFrame(pagerank_edges(40), "src long, dst long")
    got = sorted((r["node"], r["rank_fp"])
                 for r in analytics.pagerank(edges).collect())
    assert got == expected_pagerank(40)
    got13 = sorted(
        (r["node"], r["rank_fp"])
        for r in analytics.pagerank(edges.repartition(13)).collect())
    assert got13 == got  # exact long sums → layout cannot move a bit
    ranks = dict(got)
    assert max(ranks, key=ranks.get) == 0  # the hub node
    scale = 10**12
    assert 0.9 * scale <= sum(ranks.values()) <= scale
    empty = spark.createDataFrame([], "src long, dst long")
    assert analytics.pagerank(empty).count() == 0


def test_split_by_hash(spark):
    """Deterministic, partitioning-independent, incrementally stable split
    with roughly proportional buckets."""
    from wss_spark.operators import corpus

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"]
           for r in corpus.split_by_hash(docs).collect()}
    counts = {}
    for s in got.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 700 <= counts["train"] <= 900  # 0.8 ± hash noise on n=1000
    # partition layout and corpus membership don't move assignments: a
    # 17-partition subset re-derives the identical labels
    sub = docs.filter(F.col("doc_id") % 3 == 0).repartition(17)
    again = {r["doc_id"]: r["split"]
             for r in corpus.split_by_hash(sub).collect()}
    assert again == {i: got[i] for i in again}
    # custom ladder + salt: weights normalize, labels come from the ladder
    two = {r["doc_id"]: r["grp"] for r in corpus.split_by_hash(
        docs, weights=(("a", 1.0), ("b", 1.0)), salt="s2", out_col="grp"
    ).collect()}
    n_a = sum(1 for v in two.values() if v == "a")
    assert set(two.values()) == {"a", "b"} and 400 <= n_a <= 600


def test_select_by_token_budget(spark):
    """Hand-checked prefix semantics: whole qualities admitted first, the
    boundary quality admitted in id order until the residual is spent, an
    overflowing doc stops admission (even if later docs would fit)."""
    from wss_spark.operators import corpus

    rows = [
        # (doc_id, quality, ws_tokens)
        (1, 0.9, 50), (2, 0.9, 50),          # q=0.9: 100 total
        (3, 0.5, 40), (4, 0.5, 100), (5, 0.5, 10),  # q=0.5 boundary
        (6, 0.1, 5),                          # below cutoff, never reached
        (7, None, 5), (8, 0.8, None),         # null quality/tokens dropped
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, quality double, ws_tokens long")
    # budget 150: q=0.9 fits whole (100); residual 50 inside q=0.5:
    # doc 3 (40) fits (cum 40), doc 4 (100) overflows -> stop; doc 5 NOT
    # admitted although 40+10 <= 50 would fit it (prefix, not knapsack)
    got = sorted(r["doc_id"] for r in
                 corpus.select_by_token_budget(docs, 150).collect())
    assert got == [1, 2, 3]
    # budget covers everything non-null
    got_all = sorted(r["doc_id"] for r in
                     corpus.select_by_token_budget(docs, 10**6).collect())
    assert got_all == [1, 2, 3, 4, 5, 6]
    # budget smaller than the best doc -> empty
    assert corpus.select_by_token_budget(docs, 10).count() == 0
    # exact-budget boundary: zero-token docs at the cutoff quality are
    # admitted (the naive prefix keeps them at cum == budget)
    z = spark.createDataFrame(
        [(1, 0.9, 100), (2, 0.5, 0), (3, 0.5, 50), (4, 0.5, 0)],
        "doc_id long, quality double, ws_tokens long")
    got_z = sorted(r["doc_id"] for r in
                   corpus.select_by_token_budget(z, 100).collect())
    assert got_z == [1, 2]  # doc 4 sits after the overflowing doc 3


def test_dedup_near_embeddings(spark):
    """Embedding near-dedup end to end: exact-duplicate vectors collapse to
    the min-id representative; dissimilar vectors survive."""
    vecs = [(i, [float((i * 13 + d * 7) % 97 - 48) for d in range(16)])
            for i in range(8)]
    vecs.append((50, list(vecs[2][1])))   # exact dup of vec 2 → dropped
    vecs.append((51, list(vecs[5][1])))   # exact dup of vec 5 → dropped
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    kept = sorted(
        r["vec_id"]
        for r in similarity.dedup_near_embeddings(
            emb, threshold=0.999, dim=16, n_planes=3, n_tables=8
        ).select("vec_id").collect()
    )
    assert 50 not in kept and 51 not in kept
    assert set(range(8)) <= set(kept)


def test_dup_clusters_path_graph_log_rounds(spark):
    """Adversarial component shape #1 (VERDICT r04 next #3): a 10k-node
    PATH (diameter ~10^4). Pointer jumping must collapse it in O(log d)
    rounds — a neighbor-min-only propagation would need ~10^4. Measured:
    14 rounds (= ceil(log2 d) + the fixpoint-proof round)."""
    import math

    path = spark.range(9999).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    st = {}
    res = dedup.dup_clusters(path, max_iter=40, stats=st)
    assert res.filter(F.col("cluster_rep") != 0).count() == 0
    assert res.count() == 10000
    assert st["converged"]
    assert st["rounds"] <= math.ceil(math.log2(10000)) + 2, st


def test_dup_clusters_star_graph_hot_label(spark):
    """Adversarial component shape #2: a 100k-leaf STAR — one hot label
    (the center) received by every leaf. Map-side partial aggregation keeps
    the neighbor-min groupBy skew-safe; diameter 2 → rounds ≤ 3."""
    star = spark.range(1, 100001).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b"))
    st = {}
    res = dedup.dup_clusters(star, max_iter=40, stats=st)
    assert res.filter(F.col("cluster_rep") != 0).count() == 0
    assert res.count() == 100001
    assert st["converged"]
    assert st["rounds"] <= 3, st


def test_embed_text_edge_inputs(spark):
    """Null / empty / whitespace-only / shorter-than-n text all embed to the
    all-zero vector (the guarded gram offsets — Spark's sequence(1, 0) would
    otherwise DESCEND and fabricate grams from short strings)."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \t "), (4, "ab"), (5, "hello world")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["embedding"]
           for r in similarity.embed_text(docs, dim=8, n=3).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for i in (1, 2, 3, 4):
        assert got[i] == [0.0] * 8, (i, got[i])
    assert any(v != 0.0 for v in got[5])


def test_embed_text_known_values(spark):
    """The hashed signed char-n-gram math replayed independently in Python
    (same portable md5 hash, bucket = h % dim, sign by parity of h // dim) —
    the unit-level pin of the cross-engine contract the
    dd_text_embedding_dedup oracle rides on."""
    import hashlib

    text, dim, n = "the Quick  brown fox", 8, 3
    nt = "the quick brown fox"  # normalize: lower + collapse ws + trim
    expect = [0.0] * dim
    for off in range(len(nt) - n + 1):
        g = nt[off:off + n]
        h = int(hashlib.md5(("emb:" + g).encode()).hexdigest()[:7], 16)
        expect[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    [row] = similarity.embed_text(docs, dim=dim, n=n).collect()
    assert row["embedding"] == expect
    # integer-valued by construction (sums of ±1) — the exactness property
    # the oracle's 4-dp cosine replay relies on
    assert all(v == int(v) for v in row["embedding"])


def test_embed_text_partition_invariance(spark):
    docs = _docs(spark, [f"doc number {i} says alpha beta gamma {i * 17}"
                         for i in range(40)])
    one = {r["doc_id"]: r["embedding"]
           for r in similarity.embed_text(docs.coalesce(1), dim=16, n=4).collect()}
    many = {r["doc_id"]: r["embedding"]
            for r in similarity.embed_text(docs.repartition(7), dim=16, n=4).collect()}
    assert one == many


def test_dedup_near_text_recall_vs_word_overlap(spark):
    """TEXT-in near-dedup end to end at the calibrated operating point
    (dim=32, char-5-grams, cosine ≥ 0.9): every word-overlap ground-truth
    pair (3-shingle Jaccard ≥ 0.5) collapses to one survivor, and documents
    with no high-overlap partner all survive."""
    base_a = ("the quick brown fox jumps over the lazy dog while the sun "
              "sets slowly behind the old wooden barn near the river")
    base_b = ("machine learning pipelines require careful data validation "
              "and deterministic feature hashing for reproducible results")
    texts = [
        base_a,                                # 0: rep of cluster {0, 1}
        base_a.replace("lazy dog", "lazy cat"),  # 1: near-dup of 0
        base_b,                                # 2: rep of cluster {2, 3}
        base_b + " at scale",                  # 3: near-dup of 2
        "completely unrelated words about cooking pasta with fresh basil",
        "another distinct document discussing quarterly financial reports",
        "short text",                          # 6: < 5 chars of overlap, survives
    ]
    docs = _docs(spark, texts)
    gt = {(r["doc_a"], r["doc_b"])
          for r in dedup.jaccard_pairs(dedup.shingles(docs, 3), 0.5).collect()}
    assert gt == {(0, 1), (2, 3)}  # the word-overlap ground truth
    kept = sorted(r["doc_id"]
                  for r in similarity.dedup_near_text(docs).collect())
    # every GT pair collapsed to its min id; everything else survived
    assert kept == [0, 2, 4, 5, 6]


def test_top_influencers(spark):
    edges = spark.createDataFrame(
        [(100, 1, "cn"), (101, 1, "cn"), (102, 2, "cn"), (103, 3, "us")],
        "post long, reposter long, region string",
    )
    top = analytics.top_influencers(edges, "reposter", k=1, group_cols=["region"]).collect()
    assert {(r["region"], r["reposter"], r["degree"], r["rnk"]) for r in top} == {
        ("cn", 1, 2, 1),
        ("us", 3, 1, 1),
    }
    # global (no groups): deterministic tiebreak on node id
    g = analytics.top_influencers(edges, "reposter", k=2).collect()
    assert [(r["reposter"], r["degree"]) for r in sorted(g, key=lambda r: r["rnk"])] == [
        (1, 2), (2, 1),
    ]


def test_jaccard_candidate_restriction_matches_full(spark):
    """jaccard_pairs(candidates=C) must equal the full pair computation
    filtered to C — the candidate path only restricts WHICH pairs are
    scored, never their values (it joins the pair list to each side's
    shingles instead of semi-joining after the full self-join)."""
    from wss_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3} epsilon zeta") for i in range(12)]
        + [(100, "totally different words here now"),
           (101, "totally different words here now")],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs, 3).persist()
    full = dedup.jaccard_pairs(sh, threshold=0.1)
    cands = spark.createDataFrame(
        [(0, 3), (3, 6), (100, 101), (0, 100)], "doc_a long, doc_b long"
    )
    restricted = dedup.jaccard_pairs(sh, threshold=0.1, candidates=cands)
    want = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in full.join(cands, ["doc_a", "doc_b"], "left_semi").collect()
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in restricted.collect()
    )
    assert got == want and len(got) > 0

    # set semantics: a candidate pair listed twice (e.g. once per LSH
    # table), reversed, or self-paired must not inflate n_inter, flip the
    # (doc_a < doc_b) orientation, or emit a self-pair
    noisy = spark.createDataFrame(
        [(0, 3), (0, 3), (3, 0), (6, 3), (100, 101), (0, 100), (5, 5)],
        "doc_a long, doc_b long",
    )
    noisy_got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.jaccard_pairs(sh, threshold=0.1, candidates=noisy).collect()
    )
    assert noisy_got == got
    sh.unpersist()
    sh.unpersist()


def test_word_repetition_hand_checked(spark):
    docs = _docs(spark, [
        "a b a b a",        # 5 words, 2 distinct; top 'a'=3; bigrams: ab ba ab ba → 2 dup
        "x y z",            # all distinct, no dup bigrams
        "",                 # empty → zero guards
        "solo",             # 1 word → no bigrams
    ])
    rows = {r["doc_id"]: r for r in textstats.word_repetition(docs).collect()}
    assert rows[0]["n_words"] == 5
    assert rows[0]["distinct_word_frac"] == 2 / 5
    assert rows[0]["top_word_frac"] == 3 / 5
    assert rows[0]["dup_bigram_frac"] == 2 / 4
    assert rows[1]["top_word_frac"] == 1 / 3
    assert rows[1]["dup_bigram_frac"] == 0.0
    assert rows[2]["n_words"] == 0 and rows[2]["top_word_frac"] == 0.0
    assert rows[3]["n_words"] == 1 and rows[3]["dup_bigram_frac"] == 0.0


def test_line_shape_hand_checked(spark):
    text = "\n".join([
        "- first bullet",
        "- first bullet",        # duplicate bullet line (13 chars each... '- first bullet'=14)
        "plain line here.",
        "trailing dots e...",
        "  ",                    # blank after trim → dropped
        'quoted line"',
    ])
    docs = _docs(spark, [text])
    r = textstats.line_shape_stats(docs).collect()[0]
    assert r["n_lines"] == 5
    assert r["dup_line_frac"] == 1 / 5          # 5 lines, 4 distinct
    dup_chars = 2 * len("- first bullet")
    total = 2 * len("- first bullet") + len("plain line here.") + len("trailing dots e...") + len('quoted line"')
    assert r["dup_line_char_frac"] == dup_chars / total
    assert r["bullet_line_frac"] == 2 / 5
    assert r["ellipsis_line_frac"] == 1 / 5
    assert r["term_punct_line_frac"] == 3 / 5   # '.', '...', '"'


def test_gopher_filter_matches_independent_oracle(spark):
    from wss_spark import synth
    docs = spark.createDataFrame(
        synth.render_lineshape_docs(64, seed=7), "doc_id int, text string"
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"])
           for r in textstats.gopher_filter(docs).collect()}
    exp = {d: (k, why) for d, k, why in synth.expected_gopher_filter(64, seed=7)}
    assert got == exp
    # every fixture-reachable branch of the rule ladder is exercised at n=64
    # (too_many_words is pinned below with a parameterized threshold)
    assert {why for _, why in exp.values()} == {
        "kept", "too_few_words", "mean_word_len", "bullet_lines",
        "ellipsis_lines", "dup_lines", "dup_line_chars", "alpha_words",
        "stopwords",
    }


def test_gopher_filter_thresholds_are_parameters(spark):
    docs = _docs(spark, ["the data be good " * 20])  # 80 words, stopwords ok
    strict = textstats.gopher_filter(docs, min_words=100).collect()[0]
    assert (strict["keep"], strict["reject_reason"]) == (False, "too_few_words")
    lax = textstats.gopher_filter(docs, min_words=10).collect()[0]
    assert lax["keep"] is True and lax["reject_reason"] == "kept"
    over = textstats.gopher_filter(docs, min_words=10, max_words=50).collect()[0]
    assert (over["keep"], over["reject_reason"]) == (False, "too_many_words")


def test_line_stats_ascii_whitespace_trim(spark):
    # CRLF + tabs: blank lines must stay blank, endswith rules must fire
    crlf = "Good sentence.\r\n\r\nAnother one.\r"
    r = textstats.line_shape_stats(_docs(spark, [crlf])).collect()[0]
    assert r["n_lines"] == 2
    assert r["term_punct_line_frac"] == 1.0
    # dedup_lines: '\r'-blank lines survive; 'x\r' keys equal to 'x'
    from wss_spark.operators import corpus
    docs = _docs(spark, ["shared\r\n\r\nkeep a", "shared\t\nkeep b"])
    got = {row["doc_id"]: row["text"] for row in corpus.dedup_lines(docs).collect()}
    assert got[0] == "shared\r\n\r\nkeep a"
    assert got[1] == "keep b"


def test_dedup_lines_hand_checked(spark):
    from wss_spark.operators import corpus
    docs = _docs(spark, [
        "keep me\nshared footer\n\nunique a",
        "shared footer\nunique b",
        "shared footer",            # loses its only line → ''
    ])
    got = {r["doc_id"]: r["text"] for r in corpus.dedup_lines(docs).collect()}
    assert got[0] == "keep me\nshared footer\n\nunique a"   # first occurrence kept, blank kept
    assert got[1] == "unique b"
    assert got[2] == ""                                     # row survives with empty text
    # trimming defines the key: '  shared footer ' is a dup of 'shared footer'
    docs2 = _docs(spark, ["shared footer", "  shared footer "])
    got2 = {r["doc_id"]: r["text"] for r in corpus.dedup_lines(docs2).collect()}
    assert got2 == {0: "shared footer", 1: ""}


def test_dedup_lines_matches_independent_oracle(spark):
    from wss_spark import synth
    from wss_spark.operators import corpus
    docs = spark.createDataFrame(
        synth.render_boilerplate_docs(48, seed=13), "doc_id int, text string"
    )
    exp = dict(synth.expected_line_dedup(48, seed=13))
    got = {r["doc_id"]: r["text"] for r in corpus.dedup_lines(docs).collect()}
    assert got == exp
    # deterministic under a different partition layout
    got2 = {r["doc_id"]: r["text"]
            for r in corpus.dedup_lines(docs.repartition(7)).collect()}
    assert got2 == exp


def test_sample_by_source_and_temperature_rates(spark):
    from wss_spark.operators import corpus
    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(200)], "doc_id long, source string"
    )
    out = corpus.sample_by_source(docs, {"src0": 0.0, "src1": 0.4})
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert "src0" not in by_src                      # zero rate drops all
    assert len(by_src["src2"]) == 50                 # default rate keeps all
    assert len(by_src["src3"]) == 50
    assert 0 < len(by_src["src1"]) < 50              # fractional rate samples
    # content-addressed: rerun and repartition give the identical keep set
    again = {(r["doc_id"], r["source"])
             for r in corpus.sample_by_source(
                 docs.repartition(7), {"src0": 0.0, "src1": 0.4}).collect()}
    assert again == {(r["doc_id"], r["source"]) for r in rows}

    rates = corpus.temperature_rates({"big": 900, "small": 100},
                                     temperature=100.0)
    assert rates["small"] == 1.0                     # rare source capped up
    assert 0.5 < rates["big"] < 0.6                  # majority source cut
    assert corpus.temperature_rates({"a": 900, "b": 100}) == {"a": 1.0, "b": 1.0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.temperature_rates({"a": 1}, temperature=0)
    # misspelled rate keys fail fast when known_sources is supplied
    with _pytest.raises(ValueError, match="src9"):
        corpus.sample_by_source(docs, {"src9": 0.1},
                                known_sources={"src0", "src1"})


def test_scrub_pii_masks_and_counts(spark):
    from wss_spark.operators import corpus
    docs = spark.createDataFrame(
        [
            (1, "write a.b%x+1@ex-1.co.uk or c@d.io today"),
            (2, "server at 10.2.0.1 and 192.168.255.3, v1.2 is not an ip"),
            (3, "call +1 (555) 010-0042 or 555 010 1234 x"),
            (4, "clean text, no pii at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in corpus.scrub_pii(docs).collect()}
    assert got[1]["text"] == "write <EMAIL> or <EMAIL> today"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[2]["text"] == "server at <IP> and <IP>, v1.2 is not an ip"
    assert got[2]["n_ip"] == 2
    assert got[3]["text"] == "call <PHONE> or <PHONE> x"
    assert got[3]["n_phone"] == 2
    assert got[4]["text"] == "clean text, no pii at all"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[5]["text"] is None and got[5]["n_email"] is None
    # counts=False keeps the original shape
    assert corpus.scrub_pii(docs, counts=False).columns == ["doc_id", "text"]


def test_scrub_pii_does_not_overmask(spark):
    """Ordinary numeric text survives; dotted runs never leave fragments."""
    from wss_spark.operators import corpus
    keep_asis = [
        "from 2019 - 2024 revenue grew",      # year range, spaced hyphen
        "ISBN 978-0-306-40615-7 in print",    # ISBN-13 grouping
        "pages 100 200 300 400 listed",       # number list
        "at 999.999.999.999 invalid octets",  # not an IP
        "released v1.2.3.4 of the tool",      # v-prefix blocks the boundary
        "timestamp 12:30:45.123456 today",
    ]
    rows = [(i, t) for i, t in enumerate(keep_asis)] + [
        (100, "hop 1.2.3.4.5 traced"),         # absorbed wholly, no dangling .5
        (101, "dial (555) 010-1234 now"),      # parenthesized 3-3-4
        (102, "cn +8613912345678 direct"),     # bare international
    ]
    got = {r["doc_id"]: r for r in corpus.scrub_pii(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    for i, t in enumerate(keep_asis):
        assert got[i]["text"] == t, (got[i]["text"], t)
        assert (got[i]["n_email"], got[i]["n_ip"], got[i]["n_phone"]) == (0, 0, 0)
    assert got[100]["text"] == "hop <IP> traced"
    assert got[101]["text"] == "dial <PHONE> now"
    assert got[102]["text"] == "cn <PHONE> direct"


def test_scrub_pii_phone_recall_shapes(spark):
    """Phone shapes real corpora carry: bare national runs, paren without
    space, spaced/hyphenated 3-3-4 — masked; digit runs outside E.164
    lengths are not."""
    from wss_spark.operators import corpus
    rows = [
        (0, "call 5550101234 today"),           # bare 10-digit
        (1, "uk line 02012345678 here"),        # bare 11-digit
        (2, "ring (555)010-1234 asap"),         # paren, no space
        (3, "card 1234567890123456 kept"),      # 16 digits: not a phone
        (4, "code 123456789 kept"),             # 9 digits: below E.164 floor
    ]
    got = {r["doc_id"]: r["text"] for r in corpus.scrub_pii(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert got[0] == "call <PHONE> today"
    assert got[1] == "uk line <PHONE> here"
    assert got[2] == "ring <PHONE> asap"
    assert got[3] == "card 1234567890123456 kept"
    assert got[4] == "code 123456789 kept"


def test_decontaminate_drops_benchmark_overlap(spark):
    from wss_spark.operators import dedup
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally unrelated document about spark plans"),
            (3, "quick brown fox appears here too somehow"),
            (4, "short text"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id long, text string"
    )
    hits = {r["doc_id"]: r["n_hits"]
            for r in dedup.contamination_hits(docs, bench, n=3).collect()}
    # docs 1 and 3 share the 'quick brown fox' 3-gram; 2 and 4 share nothing
    assert set(hits) == {1, 3}
    assert hits[1] >= 2    # 'the quick brown' + 'quick brown fox'
    assert hits[3] == 1
    kept = {r["doc_id"] for r in
            dedup.decontaminate(docs, bench, n=3).collect()}
    assert kept == {2, 4}
    # max_hits raises the bar: doc 3 (1 shared gram) survives
    kept2 = {r["doc_id"] for r in
             dedup.decontaminate(docs, bench, n=3, max_hits=1).collect()}
    assert kept2 == {2, 3, 4}
    # disjoint benchmark → identity
    far = spark.createDataFrame([(1, "zzz yyy xxx www vvv")],
                                "doc_id long, text string")
    assert dedup.decontaminate(docs, far, n=3).count() == 4


def test_pack_sequences_stream_semantics(spark):
    from wss_spark.operators import corpus
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    out = corpus.pack_sequences(docs, max_tokens=10, n_groups=4).collect()
    assert len(out) == 40
    rows = {}
    for r in out:
        rows.setdefault(r["grp"], []).append(r)
    assert set(rows) <= {0, 1, 2, 3}
    for grp, rs in rows.items():
        rs = sorted(rs, key=lambda r: r["start_offset"])
        # offsets are a gapless concatenation stream per group
        expect = 0
        for r in rs:
            assert r["start_offset"] == expect
            assert r["bin"] == r["start_offset"] // 10
            expect += r["n_tokens"]
    # deterministic under repartitioning and re-run
    again = {(r["doc_id"], r["grp"], r["start_offset"], r["bin"])
             for r in corpus.pack_sequences(
                 docs.repartition(11), max_tokens=10, n_groups=4).collect()}
    assert again == {(r["doc_id"], r["grp"], r["start_offset"], r["bin"])
                     for r in out}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.pack_sequences(docs, max_tokens=0)


def test_train_logreg_learns_and_is_partition_invariant(spark):
    # label = 1 iff f1 > 0.5, cleanly separable on one feature
    rows = [(i, (i % 100) / 100.0, (i % 7) / 7.0, 1.0 if (i % 100) > 50 else 0.0)
            for i in range(400)]
    feats = spark.createDataFrame(rows, "doc_id long, f1 double, f2 double, label double")
    w = textstats.train_logreg(feats, ["f1", "f2"], n_iter=20, lr=4.0)
    assert len(w) == 3
    assert w[1] > 1.0                       # the informative feature dominates
    assert abs(w[2]) < abs(w[1])
    # identical weights under any partition layout (exact fixed-point grads)
    w2 = textstats.train_logreg(feats.repartition(13), ["f1", "f2"],
                                n_iter=20, lr=4.0)
    assert w == w2
    # scores separate the classes
    scored = textstats.apply_logreg(feats, w, ["f1", "f2"])
    j = scored.join(feats.select("doc_id", "label"), "doc_id")
    means = {r["label"]: r["m"] for r in
             j.groupBy("label").agg(F.avg("prob").alias("m")).collect()}
    assert means[1.0] > means[0.0] + 0.2
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textstats.train_logreg(feats.filter(F.lit(False)), ["f1", "f2"])
    with _pytest.raises(ValueError):
        textstats.apply_logreg(feats, [0.0, 1.0], ["f1", "f2"])


def test_dedup_against_incremental(spark):
    existing = _docs(spark, [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight",
    ])
    new = spark.createDataFrame(
        [
            (100, "ALPHA beta   gamma delta epsilon zeta eta theta"),  # exact (normalized)
            (101, "alpha beta gamma delta epsilon zeta eta iota"),     # near-dup of 0
            (102, "totally fresh content words appearing nowhere else"),
            (103, "totally fresh content words appearing nowhere else"),  # dup WITHIN new: kept
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in
            dedup.dedup_against(new, existing, n=3, k=8, threshold=0.5).collect()}
    assert kept == {102, 103}      # within-new dups deliberately survive
    # disjoint corpora → identity
    assert dedup.dedup_against(
        new.filter(F.col("doc_id") > 101), existing, n=3, k=8).count() == 2
    # composes with dedup_exact for full hygiene
    both = dedup.dedup_exact(
        dedup.dedup_against(new, existing, n=3, k=8, threshold=0.5))
    assert {r["doc_id"] for r in both.collect()} == {102}
    # the full input schema passes through (semi-join, not a projection)
    wide = new.withColumn("source", F.lit("crawl"))
    out = dedup.dedup_against(wide, existing, n=3, k=8, threshold=0.5)
    assert out.columns == ["doc_id", "text", "source"]
    assert out.filter(F.col("source") != "crawl").count() == 0


def test_length_quantiles_exact(spark):
    docs = spark.createDataFrame(
        [("a", v) for v in [10, 20, 30, 40]] + [("b", 100)],
        "source string, n_chars long",
    )
    got = {r["source"]: r for r in
           textstats.length_quantiles(docs, qs=(0.5, 0.9)).collect()}
    # rank = q*(n-1) linear interpolation: n=4 -> p50 at rank 1.5 = 25
    assert got["a"]["n_docs"] == 4
    assert got["a"]["q_50"] == 25.0
    assert abs(got["a"]["q_90"] - 37.0) < 1e-9   # rank 2.7 -> 30 + 0.7*10
    assert got["b"]["q_50"] == 100.0 and got["b"]["q_90"] == 100.0


def test_dedup_substrings_keep_first(spark):
    """Duplicate-span removal: first occurrence retained untouched, later
    occurrences masked; novel tokens survive; short/null docs pass whole;
    overlapping duplicate windows merge into one maximal removed span."""
    docs = spark.createDataFrame(
        [
            ("a", "one two three four five six seven eight nine ten"),
            ("b", "X one two three four five six seven eight nine ten Y"),
            ("c", "totally different words with no overlap at all here"),
            ("d", "one two three four five six seven eight nine ten"),
            ("e", "short text"),
            ("f", None),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in dedup.dedup_substrings(docs, n=8).collect()}
    assert got["a"]["clean_text"] == "one two three four five six seven eight nine ten"
    assert got["a"]["n_removed"] == 0
    # b's embedded copy masks entirely (windows overlap → union of spans)
    assert got["b"]["clean_text"] == "X Y"
    assert got["b"]["n_removed"] == 10
    assert got["c"]["n_removed"] == 0
    # exact duplicate of a: collapses to nothing, a survives
    assert got["d"]["clean_text"] == "" and got["d"]["n_removed"] == 10
    assert got["e"]["clean_text"] == "short text"  # < n tokens: untouched
    assert got["f"]["clean_text"] == "" and got["f"]["n_tokens"] == 0


def test_dedup_substrings_cjk_and_invariance(spark):
    """CJK text dedups per character run (canonical mixed pretokens), and
    the result is partition-invariant."""
    dup_cn = "深度学习模型训练需要大量高质量数据支持"
    docs = spark.createDataFrame(
        [("a", dup_cn + "第一份"), ("b", "前言" + dup_cn), ("c", "完全不同的内容和主题词汇语料样本测试")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in dedup.dedup_substrings(docs, n=8).collect()}
    assert got["a"]["n_removed"] == 0
    # b's copy of the shared run is removed; its novel prefix survives
    assert got["b"]["n_removed"] >= len(dup_cn) - 1
    assert got["b"]["clean_text"].startswith("前 言")
    assert got["c"]["n_removed"] == 0

    a = sorted(map(tuple, dedup.dedup_substrings(docs.repartition(1), n=8).collect()))
    b = sorted(map(tuple, dedup.dedup_substrings(docs.repartition(5), n=8).collect()))
    assert a == b


def test_dedup_substrings_matches_python_replica(spark):
    """Randomized corpora from a tiny vocabulary (maximal span collisions)
    must match an independent pure-Python implementation of the spec:
    cjk-spaced whitespace tokens, n-token windows, keep-first by
    (doc_id, pos), remove all covered tokens of later occurrences."""
    import hashlib
    import random

    N = 4
    vocab = ["alpha", "beta", "gamma", "delta", "ep", "zeta", "eta", "theta"]

    def replica(docs_py, n):
        occ = {}  # gram -> list[(doc, pos)]
        toks_by = {}
        for did, text in docs_py:
            toks = [t for t in (text or "").split() if t]
            toks_by[did] = toks
            for p in range(len(toks) - n + 1):
                g = hashlib.md5(" ".join(toks[p:p + n]).encode()).hexdigest()
                occ.setdefault(g, []).append((did, p))
        removed = {did: set() for did, _ in docs_py}
        for g, hits in occ.items():
            if len(hits) < 2:
                continue
            first = min(hits)
            for did, p in hits:
                if (did, p) == first:
                    continue
                removed[did].update(range(p, p + n))
        out = {}
        for did, _ in docs_py:
            toks = toks_by[did]
            rem = removed[did] & set(range(len(toks)))
            kept = [t for i, t in enumerate(toks) if i not in rem]
            out[did] = (" ".join(kept), len(toks), len(rem))
        return out

    rng = random.Random(20260821)
    for trial in range(3):
        docs_py = []
        for d in range(50):
            n_words = rng.randint(0, 14)
            docs_py.append(
                (f"{trial}d{d:02d}",
                 " ".join(rng.choice(vocab) for _ in range(n_words)))
            )
        docs = spark.createDataFrame(docs_py, "doc_id string, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
            for r in dedup.dedup_substrings(docs, n=N).collect()
        }
        want = replica(docs_py, N)
        assert got == want
