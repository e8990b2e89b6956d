"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the standard near-dup stack for web-scale corpus curation.

Scale notes (the whole point of these shapes):
- exact: one hash-groupBy — shuffle on a uniform 128-bit key, no skew.
- MinHash/LSH: signatures are a projection (no shuffle); candidate
  generation is a self-join on *band keys* — rows per band bucket are
  tiny, so the O(n²) pair explosion never happens; verification runs
  only on bucket-mates.
- SimHash: projection → same-signature groupBy.
- n-gram Jaccard: exact verification, bucketed to bound pair counts.

Hash choice: md5 (hex string) everywhere — present and bit-identical in
Spark and DuckDB, so every operator has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 8
N_BANDS = 4  # band size 2


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, n_docs, min_doc_id) per content group."""
    return (
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def _distinct_tokens() -> F.Column:
    return F.array_distinct(F.split("text", " "))


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """Per-doc MinHash signature: h_i = min over distinct tokens of
    md5(i || ':' || token).  Pure projection."""
    sig = F.expr(
        f"transform(sequence(0, {n_hashes - 1}),"
        " hi -> array_min(transform(array_distinct(split(text, ' ')),"
        " ht -> md5(concat(hi, ':', ht)))))"
    )
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"), sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = N_MINHASH, n_bands: int = N_BANDS, threshold: float = 0.5
) -> DataFrame:
    """LSH banding → candidate pairs → exact Jaccard verification.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥
    threshold.  The exact-verify join re-attaches distinct token sets
    only for bucket-mates.
    """
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(docs, n_hashes)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}),"
                f" bb -> concat(bb, '|', array_join(slice(sig, bb * {rows_per_band} + 1, {rows_per_band}), '|')))"
            )
        ).alias("band_key"),
    )
    other = bands.select(F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk2"))
    cand = (
        bands.join(other, on=[bands["band_key"] == other["bk2"], bands["doc_id"] < other["doc_b"]])
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    toks = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), _distinct_tokens().alias("tset")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("tset").alias("ta"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("tset").alias("tb"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash from md5 hex digits: bit b's vote per token is +1
    if hex digit b of md5(token) ≥ 8 else −1; bit set iff vote sum > 0."""
    sim = F.expr(
        f"""
        aggregate(
          transform(sequence(0, {bits - 1}), sb ->
            if(aggregate(array_distinct(split(text, ' ')), 0,
                 (acc, st) -> acc + if(conv(substring(md5(st), sb + 1, 1), 16, 10) >= 8, 1, -1)
               ) > 0, shiftleft(1L, sb), 0L)),
          0L, (acc2, sx) -> acc2 + sx)
        """
    )
    return docs.select(F.col("doc_id").cast("string").alias("doc_id"), sim.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, shingle_n: int = 3
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs bucketed by (lang, n_tokens)
    — bucket bound keeps the self-join quadratic term local."""
    sh = F.expr(
        f"""
        array_distinct(transform(
          sequence(0, greatest(size(split(text, ' ')) - {shingle_n}, 0) - 1 + 1),
          ss -> array_join(slice(split(text, ' '), ss + 1, {shingle_n}), ' ')))
        """
    )
    base = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        sh.alias("shingles"),
    )
    a = base.select("lang", "n_tokens", F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = base.select(
        F.col("lang").alias("lang2"), F.col("n_tokens").alias("nt2"),
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"),
    )
    return (
        a.join(b, on=[a["lang"] == b["lang2"], a["n_tokens"] == b["nt2"], a["doc_a"] < b["doc_b"]])
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
