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
    """An identical vector pair must land in the same bucket in every
    AND-OR table."""
    from snorkel_spark.operators.similarity import N_TABLES, lsh_buckets

    dup = emb.limit(1).withColumn("vec_id", F.lit(99999))
    b = lsh_buckets(emb.unionByName(dup))
    assert b.count() == (emb.count() + 1) * N_TABLES
    first = {r["table_id"]: r["bucket"] for r in b.filter("vec_id = 0").collect()}
    dupb = {r["table_id"]: r["bucket"] for r in b.filter("vec_id = 99999").collect()}
    assert first == dupb and len(first) == N_TABLES


def test_lsh_dim_agnostic(spark, emb):
    """Planes derive from size(embedding): any dim yields a full valid
    bucketing (no silent null-padding as with hard-wired dim 64)."""
    from snorkel_spark.operators.similarity import lsh_buckets

    for dim in (16, 48):
        e = emb.select("vec_id", F.expr(f"slice(embedding, 1, {dim})").alias("embedding"))
        b = lsh_buckets(e)
        assert b.filter("bucket is null").count() == 0
        # a real spread of buckets, not one degenerate value
        assert b.select("table_id", "bucket").distinct().count() > 10


def test_lsh_neighbor_pairs_finds_planted(spark, emb):
    """Planted perturbed copies (different vectors, cos ≈ 0.99) are
    recovered through the amplified bucket join — no label blocking."""
    from snorkel_spark.operators.similarity import embedding_near_dups
    from snorkel_spark.sources.fixtures import embeddings_with_planted_dups

    aug = embeddings_with_planted_dups(emb, every=10)
    n_planted = emb.filter("vec_id % 10 = 0").count()
    found = embedding_near_dups(aug, threshold=0.95)
    hits = found.filter("id_b = id_a + 1000000").count()
    # sign-LSH recall at cos≈0.99 with 8 planes × 2 tables ≥ ~90%
    assert hits >= int(0.7 * n_planted)
    # and nothing from the raw corpus (max true cos ≈ 0.51)
    assert found.filter("id_b < 1000000").count() == 0


def test_ngram_jaccard_finds_length_differing_near_dups(spark, docs):
    """The MinHash-band blocking finds near-dups whose token counts
    DIFFER (the failure mode of any exact-length blocking): plant a
    copy of a doc with its first token dropped."""
    from snorkel_spark.operators.dedup import ngram_jaccard_pairs

    plant = docs.filter("doc_id % 50 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("array_join(slice(split(text, ' '), 2, size(split(text, ' ')) - 1), ' ')").alias("text"),
        "lang", "source", "n_chars",
    )
    n_planted = plant.count()
    pairs = ngram_jaccard_pairs(docs.unionByName(plant), threshold=0.5)
    hits = pairs.filter(
        F.abs(F.col("doc_b").cast("long") - F.col("doc_a").cast("long")) == 100000
    ).count()  # pair order is by doc_id STRING, so the planted id can land on either side
    assert hits == n_planted  # shingle J ≈ (L−3)/(L−2) ≥ 0.5 always here


def test_ngram_jaccard_backend_equivalence(spark, docs):
    """hash_backend='xxhash64' (integer, the at-scale choice) yields the
    SAME verified pair set as the md5 oracle-parity default, and the
    gate-query params (32 hashes / 16 bands) also reproduce it — exact
    verification makes the result insensitive to both knobs here."""
    from snorkel_spark.operators.dedup import ngram_jaccard_pairs

    plant = docs.filter("doc_id % 50 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("array_join(slice(split(text, ' '), 2, size(split(text, ' ')) - 1), ' ')").alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(plant)

    def pairset(**kw):
        return {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(corpus, threshold=0.5, **kw).collect()
        }

    base = pairset()
    assert pairset(hash_backend="xxhash64") == base
    assert pairset(n_hashes=32, n_bands=16) == base
    assert pairset(n_hashes=32, n_bands=16, hash_backend="xxhash64") == base


def test_lsh_bucket_cap_bounds_candidates(spark, docs):
    """max_bucket is enforced: with a tiny cap, no surviving band bucket
    is wider than the cap (bounding the w² pair blowup), and the audit
    stats expose the full width distribution."""
    from snorkel_spark.operators.dedup import (
        _band_keys,
        lsh_bucket_stats,
        minhash_signatures,
    )

    stats = lsh_bucket_stats(docs, shingle_n=1)
    widths = {r["width"]: r["n_buckets"] for r in stats.collect()}
    assert max(widths) > 4  # the corpus does have wide unigram buckets
    # mirror the capped candidate path and assert the bound holds
    bands = _band_keys(minhash_signatures(docs, 128, 1), 128, 32)
    ok = bands.groupBy("band_key").count().filter("count <= 4")
    surviving = bands.join(ok.select("band_key"), "band_key")
    max_w = (
        surviving.groupBy("band_key").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_w <= 4


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


def test_frame_sample_and_resize(spark, raw):
    """Frame fan-out count = ceil(n_bytes/stride); resize truncates
    payloads and preserves row count (schema contract intact)."""
    from snorkel_spark.operators.multimodal import (
        fetch_payloads,
        frame_sample,
        media_spans,
        resize_stub,
    )

    m = fetch_payloads(media_spans(raw)).cache()
    fr = frame_sample(m, stride=4, frame_bytes=8)
    one = m.limit(1).collect()[0]
    got = fr.filter(
        (F.col("doc_id") == one["doc_id"]) & (F.col("media_ref") == one["media_ref"])
    ).count()
    assert got == (one["n_bytes"] + 3) // 4
    rz = resize_stub(m, max_bytes=5)
    assert rz.filter("n_bytes > 5").count() == 0
    assert rz.count() == m.count()


def test_auto_n_planes_keeps_bucket_width_constant(spark, emb):
    """The automated growth rule: expected bucket width n / 2^p stays
    within [target/2, 2·target] across 10×/100×/1000× corpus growth
    (until the plane clamp), so the pair join never drifts quadratic."""
    from snorkel_spark.operators.similarity import auto_n_planes, lsh_buckets

    target = 64
    widths = {}
    for n in (1_000, 10_000, 100_000, 1_000_000, 10_000_000):
        p = auto_n_planes(n, target_bucket=target)
        widths[n] = n / 2**p
        if p < 24:  # below the clamp the invariant must hold
            assert target / 2 <= widths[n] <= 2 * target, (n, p, widths[n])
    assert auto_n_planes(0) == 4 and auto_n_planes(10) == 4  # clamps
    # and the computed plane count actually drives a valid bucketing
    p = auto_n_planes(emb.count(), target_bucket=64)
    b = lsh_buckets(emb, n_planes=p)
    assert b.groupBy("table_id").count().count() == 2  # both tables present


def test_connected_components_chain_and_clique(spark):
    """A 4-node chain (diameter 3 — needs >1 propagation round), a
    triangle, and an isolated pair each collapse to min-id components."""
    from snorkel_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),        # chain a-b-c-d
         ("x", "y"), ("y", "z"), ("x", "z"),        # triangle
         ("p", "q")],                               # pair
        "doc_a string, doc_b string",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x", "z": "x",
                   "p": "p", "q": "p"}


def test_duplicate_clusters_merges_exact_and_near(spark, docs):
    """An exact copy AND a near-dup (one token changed) of the same doc
    land in ONE cluster keyed by the original doc_id — the transitive
    step that pairwise output alone cannot give."""
    from snorkel_spark.operators.dedup import duplicate_clusters

    base = docs.orderBy("doc_id").limit(1).collect()[0]
    near_text = base["text"].replace(base["text"].split(" ")[2], "zzz", 1)
    extra = spark.createDataFrame(
        [(str(90000), base["text"]), (str(90001), near_text)],
        "doc_id string, text string",
    )
    aug = docs.select(F.col("doc_id").cast("string"), "text").unionByName(extra)
    cl = duplicate_clusters(aug, threshold=0.5, n_hashes=32, n_bands=16)
    want = str(base["doc_id"])
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got.get("90000") == min(want, "90000")
    assert got.get("90001") == min(want, "90000", "90001")
    assert got.get(want) == min(want, "90000")


def test_ivf_topk_recall_vs_exact(spark, emb):
    """IVF with n_probe=n_centroids degenerates to exact brute force
    (identical to cosine_topk); at n_probe=4/16 recall@3 stays ≥ 0.5 on
    the raw corpus (approximate by design, but not junk)."""
    from snorkel_spark.operators.similarity import cosine_topk, ivf_topk

    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=3)
    full = ivf_topk(emb, qids, k=3, n_centroids=8, n_probe=8)
    e = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    f = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in full.collect()}
    assert e == f
    approx = ivf_topk(emb, qids, k=3, n_centroids=16, n_probe=4)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e2 = {(q, n) for q, n, _ in e}
    assert len(a & e2) / len(e2) >= 0.5


def test_ivf_kmeans_centroids_compose(spark, emb):
    """k-means-refined centroids plug into the same assign/topk chain
    (shape contract; no bit-exact oracle by design — float reduction
    order is engine-specific)."""
    from snorkel_spark.operators.similarity import ivf_assign, ivf_kmeans_centroids

    cents = ivf_kmeans_centroids(emb, n_centroids=4, max_iter=3)
    assert cents.count() == 4
    assign = ivf_assign(emb, cents)
    assert assign.count() == emb.count()
    assert assign.select("centroid_id").distinct().count() <= 4


def test_top_terms_rank_and_ties(spark):
    from snorkel_spark.operators.textstats import top_terms

    docs = spark.createDataFrame(
        [(1, "b a c"), (2, "a b"), (3, "a z z"), (4, "q")],
        "doc_id long, text string",
    )
    got = [(r["rank"], r["term"], r["doc_freq"]) for r in
           top_terms(docs, k=3).orderBy("rank").collect()]
    # df: a=3, b=2, c=1, z=1(distinct per doc), q=1 → ties at 1 break
    # alphabetically; within-doc repeats count once
    assert got == [(1, "a", 3), (2, "b", 2), (3, "c", 1)]


def test_redact_pii_planted(spark, docs):
    """Planted PII is counted and fully scrubbed; untouched docs pass
    through byte-identical; the SSN-shaped id is not half-eaten by the
    phone pattern."""
    from snorkel_spark.operators.textstats import redact_pii
    from snorkel_spark.sources.fixtures import docs_with_planted_pii

    aug = docs_with_planted_pii(docs)
    red = redact_pii(aug).cache()
    planted = red.filter(F.expr("cast(doc_id as bigint) % 7 = 0"))
    n_planted = planted.count()
    assert n_planted > 0
    assert planted.filter("n_email = 1 and n_phone = 1 and n_ssn = 1").count() == n_planted
    assert planted.filter(
        "redacted_text like '%[EMAIL]%' and redacted_text like '%[PHONE]%'"
        " and redacted_text like '%[SSN]%'"
    ).count() == n_planted
    leak = red.filter(
        "redacted_text rlike '[0-9]{3}-[0-9]{2}-[0-9]{4}'"
        " or redacted_text rlike '@[A-Za-z0-9.-]+[.][A-Za-z]'"
    )
    assert leak.count() == 0
    clean = red.filter(F.expr("cast(doc_id as bigint) % 7 != 0"))
    joined = clean.join(docs.selectExpr("cast(doc_id as string) doc_id", "text"), "doc_id")
    assert joined.filter("redacted_text != text").count() == 0


def test_decontaminate_planted_overlap(spark):
    """A corpus doc sharing a 3-gram window with the eval doc is
    flagged with the exact distinct-shingle hit count; disjoint docs
    are not flagged; min_hits filters."""
    from snorkel_spark.operators.textstats import decontaminate

    ev = spark.createDataFrame([(100, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "x alpha beta gamma y"),       # shares 1 shingle: 'alpha beta gamma'
         (2, "alpha beta gamma delta tail"),  # shares 2
         (3, "no overlap here at all")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, ev, 3).collect()}
    assert got == {"1": 1, "2": 2}
    got2 = {r["doc_id"] for r in decontaminate(corpus, ev, 3, min_hits=2).collect()}
    assert got2 == {"2"}


def test_assign_splits_deterministic_and_proportional(spark, docs):
    from snorkel_spark.operators.textstats import assign_splits

    s1 = assign_splits(docs)
    s2 = assign_splits(docs)
    assert s1.exceptAll(s2).count() == 0  # content-stable across runs
    frac = {r["split"]: r["count"] for r in s1.groupBy("split").count().collect()}
    n = sum(frac.values())
    assert n == docs.count()
    # uniform hash → rough 80/10/10 (wide tolerance at 500 docs)
    assert 0.6 < frac.get("train", 0) / n < 0.95
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # buckets in range, split consistent with bucket
    bad = s1.filter(
        "bucket < 0 or bucket > 99"
        " or (bucket < 80 and split != 'train')"
        " or (bucket >= 80 and bucket < 90 and split != 'val')"
        " or (bucket >= 90 and split != 'test')"
    )
    assert bad.count() == 0


def test_repetition_stats_planted(spark):
    from snorkel_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham"),   # 'spam ham' 2-gram ×3
         (2, "a b c d e f"),                  # all n-grams unique
         (3, "x")],                           # too short for any n-gram
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got["1"]["top2_cnt"] == 3 and got["1"]["top2_frac"] == 1.0
    assert got["1"]["top3_cnt"] == 2  # 'spam ham spam' ×2 (overlapping)
    assert got["2"]["top2_cnt"] == 1 and got["2"]["top2_frac"] == round(2 / 6, 6)
    assert got["3"]["top2_cnt"] == 0 and got["3"]["top2_frac"] == 0.0


def test_ivf_partitioned_write_prunes(spark, emb, tmp_path):
    """The documented IVF scale claim, demonstrated: corpus written
    partitioned by centroid_id → a probe filter becomes PARTITION
    pruning at the scan (visible in the physical plan), and the pruned
    read returns exactly the probed lists."""
    import contextlib
    import io

    from snorkel_spark.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, 8)
    idx = ivf_assign(emb, cents)
    path = str(tmp_path / "ivf_corpus")
    emb.join(idx, "vec_id").write.partitionBy("centroid_id").parquet(path)
    # probe two REAL inverted lists (centroid ids are stride-sampled
    # vec_ids, not 0..k-1)
    cids = sorted(r[0] for r in idx.select("centroid_id").distinct().collect())
    probe = cids[:2]
    probed = spark.read.parquet(path).filter(F.col("centroid_id").isin(probe))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters")[1][:200]
    want = idx.filter(F.col("centroid_id").isin(probe)).count()
    assert probed.count() == want and want > 0
    # pruning is physical, not a post-filter: execute the probe and
    # read the scan node's ACTUAL numFiles metric — strictly fewer
    # than the partitioned corpus's file count on disk
    import glob

    total_files = len(glob.glob(f"{path}/centroid_id=*/*.parquet"))
    probed.collect()
    leaf = probed._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    mets, n_files = leaf.metrics().iterator(), None
    while mets.hasNext():
        kv = mets.next()
        if kv._1() == "numFiles":
            n_files = kv._2().value()
    assert n_files is not None and 0 < n_files < total_files


def test_kmv_sketch_estimate_and_degenerate(spark, docs):
    """KMV bottom-k sketch: on a large distinct space (3-shingles) the
    estimate lands within the ~3/√k theoretical band of the exact
    count; when distinct < k the sketch degenerates to the exact set.
    The plan uses TakeOrdered (per-partition bottom-k + tiny merge),
    never a global sort."""
    import contextlib
    import io

    from snorkel_spark.operators.sketches import kmv_distinct_tokens

    row = kmv_distinct_tokens(docs, k=64, shingle_n=3).collect()[0]
    exact = row["exact_distinct"]
    assert exact > 64
    assert abs(row["kmv_estimate"] - exact) / exact < 3 / (64 ** 0.5)
    # degenerate: tiny vocabulary (< k distinct tokens) → exact
    row2 = kmv_distinct_tokens(docs, k=64, shingle_n=1).collect()[0]
    assert row2["kmv_estimate"] == float(row2["exact_distinct"])
    # bottom-k plans as top-k, not a global sort
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kmv_distinct_tokens(docs, k=64, shingle_n=3).explain(True)
    assert "TakeOrdered" in buf.getvalue()


def test_kmv_jaccard_identity_and_band(spark, docs):
    """KMV Jaccard: a corpus against itself is exactly 1.0 through the
    sketch (every union hash is in both sides); disjoint halves give
    estimate and exact both near 0 within the k-sample band."""
    from snorkel_spark.operators.sketches import kmv_jaccard

    a = docs.filter("doc_id % 2 = 0")
    same = kmv_jaccard(a, a, k=64).collect()[0]
    assert same["kmv_jaccard"] == 1.0 and same["exact_jaccard"] == 1.0
    b = docs.filter("doc_id % 2 = 1")
    row = kmv_jaccard(a, b, k=256).collect()[0]
    assert 0.0 <= row["exact_jaccard"] <= 1.0
    # binomial band for the bottom-k sample of the union
    j = row["exact_jaccard"]
    band = 3 * ((j * (1 - j) / 256) ** 0.5) + 1 / 256
    assert abs(row["kmv_jaccard"] - j) <= band, row


def test_lsh_capped_groupby_pairs_equal_join_pairs(spark, docs):
    """r06 optimization contract: the capped bucket-local pair
    explosion (groupBy + sorted-member explode) must produce exactly
    the pair set of the uncapped self-join path when the cap is larger
    than every bucket."""
    from snorkel_spark.operators.dedup import ngram_jaccard_pairs

    capped = ngram_jaccard_pairs(
        docs, threshold=0.0, n_hashes=16, n_bands=8, max_bucket=10**9
    )
    joined = ngram_jaccard_pairs(
        docs, threshold=0.0, n_hashes=16, n_bands=8, max_bucket=None
    )
    a = {(r["doc_a"], r["doc_b"]) for r in capped.select("doc_a", "doc_b").collect()}
    b = {(r["doc_a"], r["doc_b"]) for r in joined.select("doc_a", "doc_b").collect()}
    assert a == b and len(a) > 0


def test_repetition_stats_equals_bruteforce(spark):
    """r06 optimization contract: the sorted-run max-frequency kernel
    must reproduce the brute-force n-gram counts."""
    from collections import Counter

    from snorkel_spark.operators.textstats import repetition_stats

    texts = [
        "a b a b a b c",          # top2 'a b'×3, top3 'a b a'×2
        "x",                       # shorter than any gram
        "w w w w",                # top2 'w w'×3, top3 'w w w'×2
        "p q r p q r p q",        # mixed runs
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}

    def brute(t, n):
        toks = t.split(" ")
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return max(Counter(grams).values()) if grams else 0

    for i, t in enumerate(texts):
        assert got[str(i)]["top2_cnt"] == brute(t, 2), (i, t)
        assert got[str(i)]["top3_cnt"] == brute(t, 3), (i, t)


def test_lsh_duplicate_doc_id_rows_no_self_pairs(spark, docs):
    """Duplicate doc_id rows must not produce doc_a == doc_b pairs
    (the strict a < b contract of the join shape)."""
    from snorkel_spark.operators.dedup import ngram_jaccard_pairs

    doubled = docs.limit(20).unionByName(docs.limit(20))
    pairs = ngram_jaccard_pairs(doubled, threshold=0.0, n_hashes=16, n_bands=8)
    assert pairs.filter("doc_a >= doc_b").count() == 0
