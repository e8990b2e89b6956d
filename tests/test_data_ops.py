"""Dedup / similarity / textstats / multimodal operators."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dup_groups(spark, docs):
    from snorkel_spark.operators.dedup import exact_dup_groups

    g = exact_dup_groups(docs)
    assert g.count() == docs.select("text").distinct().count()
    # inject a duplicate → group of 2
    dup = docs.limit(1).withColumn("doc_id", F.lit(99999))
    g2 = exact_dup_groups(docs.unionByName(dup))
    assert g2.filter("n_docs = 2").count() == 1


def test_minhash_lsh_superset_check(spark, docs):
    """LSH candidates verified ≥ τ must be a subset of brute-force pairs
    ≥ τ (soundness); for an injected exact dup, LSH must find it
    (banding guarantees equal signatures collide)."""
    from snorkel_spark.operators.dedup import minhash_lsh_pairs

    dup = docs.limit(1).withColumn("doc_id", F.lit(99999))
    pairs = minhash_lsh_pairs(docs.unionByName(dup), threshold=0.99)
    assert pairs.filter("jaccard >= 0.999999").count() >= 1


def test_simhash_identical_docs_equal_sig(spark, docs):
    from snorkel_spark.operators.dedup import simhash_signatures

    dup = docs.limit(1).withColumn("doc_id", F.lit(99999))
    sigs = simhash_signatures(docs.unionByName(dup))
    top = sigs.groupBy("simhash").count().agg(F.max("count")).collect()[0][0]
    assert top >= 2


def test_cosine_topk_self_excluded_and_sorted(spark, emb):
    from snorkel_spark.operators.similarity import cosine_topk

    t = cosine_topk(emb, [0, 1], k=5)
    rows = t.collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos"]))
    for q, rs in by_q.items():
        rs.sort()
        assert len(rs) == 5
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_lsh_bucket_recall(spark, emb):
    """An identical vector pair must land in the same bucket."""
    from snorkel_spark.operators.similarity import lsh_buckets

    dup = emb.limit(1).withColumn("vec_id", F.lit(99999))
    b = lsh_buckets(emb.unionByName(dup))
    two = b.groupBy("bucket").count().agg(F.sum("count")).collect()[0][0]
    assert two == emb.count() + 1
    ids = {r["bucket"] for r in b.filter(F.col("vec_id").isin([0, 99999])).collect()}
    first_bucket = b.filter("vec_id = 0").collect()[0]["bucket"]
    dup_bucket = b.filter("vec_id = 99999").collect()[0]["bucket"]
    assert first_bucket == dup_bucket


def test_textstats(spark, docs):
    from snorkel_spark.operators.textstats import fingerprints, quality_scores, token_stats

    ts = token_stats(docs)
    bad = ts.filter("n_ws_tokens <= 0 or n_bpe_tokens < n_ws_tokens")
    assert bad.count() == 0
    q = quality_scores(docs)
    assert q.filter("quality < 0 or quality > 1").count() == 0
    fp = fingerprints(docs)
    # deterministic: identical text → identical fingerprint
    assert fp.count() == docs.count()
    assert fp.select("fingerprint").distinct().count() > 400


def test_multimodal_plumbing(spark, raw):
    from snorkel_spark.operators.multimodal import (
        extract_features, fetch_payloads, media_spans, _decode_bytes,
    )

    m = media_spans(raw)
    n_media = m.count()
    assert n_media > 0
    feats = extract_features(fetch_payloads(m), fake=True)
    rows = feats.collect()
    assert len(rows) == n_media
    assert all(0 <= r["feature"] < 997 and r["n_bytes"] > 0 for r in rows)
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"xx", "image", fake=False)
