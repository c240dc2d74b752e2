"""Release sharding + checksummed manifest (corpus.release_shards /
write_release / verify_release).

The gate `llm_release_manifest` value-oracles the manifest math against a
DuckDB replay; these tests pin what the oracle can't see: partition
invariance of the assignment, the write/verify round trip, and that
verify_release actually catches a tampered shard.
"""

import pytest
from pyspark.sql import functions as F

from wss_spark.operators import corpus


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "一段中文文本没有空格"),
    (3, ""),
    (4, None),
    (5, "hello world " * 40),
    (6, "short"),
    (7, "the cat sat on the mat"),  # exact dup of 1 — still its own doc
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_manifest_partition_invariant(spark, docs):
    def mf(d):
        _, m = corpus.release_shards(d, n_shards=4)
        return sorted(tuple(r) for r in m.collect())

    assert mf(docs) == mf(docs.repartition(13))
    # assignment itself is content-addressed: same doc -> same shard
    s1, _ = corpus.release_shards(docs, n_shards=4)
    s2, _ = corpus.release_shards(docs.repartition(7), n_shards=4)
    a = {r["doc_id"]: r["shard_id"] for r in s1.collect()}
    b = {r["doc_id"]: r["shard_id"] for r in s2.collect()}
    assert a == b


def test_manifest_totals(spark, docs):
    sharded, manifest = corpus.release_shards(docs, n_shards=4)
    assert sharded.columns == ["doc_id", "text", "shard_id"]
    rows = manifest.collect()
    assert sum(r["n_docs"] for r in rows) == len(DOCS)
    # mirror of the canonical mixed unit (textstats.token_count): each CJK
    # char is its own token — doc 2's unspaced Chinese counts 10, not 1
    import re

    from wss_spark.operators.textstats import CJK_CLASS

    def mixed(t):
        return len(re.sub(f"({CJK_CLASS})", r" \1 ", t or "").split())

    want_tokens = sum(mixed(t) for _, t in DOCS)
    assert want_tokens > sum(len((t or "").split()) for _, t in DOCS)
    assert sum(r["n_tokens"] for r in rows) == want_tokens
    want_bytes = sum(len((t or "").encode("utf-8")) for _, t in DOCS)
    assert sum(r["n_bytes"] for r in rows) == want_bytes


def test_write_verify_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "release")
    corpus.write_release(docs, out, n_shards=4)
    assert corpus.verify_release(spark, out).count() == 0
    # a trainer reading one shard gets exactly that shard's docs
    data = spark.read.parquet(f"{out}/data")
    one = data.where(F.col("shard_id") == data.select("shard_id").first()[0])
    assert one.count() > 0


def test_verify_catches_tamper(spark, docs, tmp_path):
    out = str(tmp_path / "release")
    corpus.write_release(docs, out, n_shards=2)
    # tamper: rewrite the data with one document's text altered
    data = spark.read.parquet(f"{out}/data").cache()
    data.count()
    tampered = data.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.lit("ALTERED")).otherwise(F.col("text")),
    )
    tampered.write.mode("overwrite").parquet(f"{out}/data2")
    data.unpersist()
    import shutil
    shutil.rmtree(f"{out}/data")
    shutil.move(f"{out}/data2", f"{out}/data")
    bad = corpus.verify_release(spark, out).collect()
    assert bad, "tampered shard must surface"
    fields = {r["field"] for r in bad}
    assert "checksum" in fields
    # only the tampered shard is implicated
    s, _ = corpus.release_shards(docs, n_shards=2)
    bad_shard = s.where(F.col("doc_id") == 1).first()["shard_id"]
    assert {r["shard_id"] for r in bad} == {bad_shard}


def test_bad_n_shards(docs):
    with pytest.raises(ValueError):
        corpus.release_shards(docs, n_shards=0)


def test_release_crash_before_marker(spark, docs, tmp_path):
    """Crash-between-write-and-marker (VERDICT r04 next #4): the on-disk
    state of a writer that died after the data/manifest parquet landed but
    before the commit point is exactly 'everything minus the marker'. The
    release must read as uncommitted, verify_release must REFUSE it, and a
    re-run must recover to a committed, verifiably clean release."""
    import os

    out = str(tmp_path / "rel_crash")
    corpus.write_release(docs, out, n_shards=4)
    assert corpus.release_committed(out)

    # simulate the crash: marker is written last, so removing it reproduces
    # the exact pre-commit on-disk state
    os.remove(os.path.join(out, "_RELEASE_COMMIT.json"))
    assert not corpus.release_committed(out)
    with pytest.raises(ValueError, match="uncommitted"):
        corpus.verify_release(spark, out)

    # recovery: the writer re-runs idempotently (overwrite + marker last)
    corpus.write_release(docs, out, n_shards=4)
    assert corpus.release_committed(out)
    assert corpus.verify_release(spark, out).count() == 0


def test_release_marker_totals_match_manifest(spark, docs, tmp_path):
    import json, os

    out = str(tmp_path / "rel_tot")
    corpus.write_release(docs, out, n_shards=4)
    with open(os.path.join(out, "_RELEASE_COMMIT.json")) as f:
        marker = json.load(f)
    man = spark.read.parquet(f"{out}/_manifest")
    tot = man.agg(F.sum("n_docs"), F.sum("n_tokens"), F.sum("n_bytes")).first()
    assert marker["n_docs"] == tot[0] == len(DOCS)
    assert marker["n_tokens"] == tot[1]
    assert marker["n_bytes"] == tot[2]
    assert marker["n_nonempty_shards"] == man.count()
