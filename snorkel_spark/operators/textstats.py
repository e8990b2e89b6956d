"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

No reference counterpart (the reference is a labeling framework); these
are the corpus-hygiene operators a 100 TB ingest needs.  All pure
built-in expressions — single projection over the scan, no shuffle, no
Python — and each has an exact DuckDB SQL twin (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword-voting
# heuristic (word-salad corpus ⇒ the vote is dominated by 'the'/'a';
# the operator shape is what matters at scale)
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "de", "et"],
    "zh": ["de", "le", "he", "shi"],
}

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation
BPE_RGX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

FP_PRIME = 1000000007


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars_nospace)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_RGX}', 0)")).alias("n_bpe_tokens"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars_nospace"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / distinct-ratio / stopword-ratio / mean-token-length
    composite quality score.

    Every output is a RATIONAL of small integers (token/char counts),
    so 6-dp rounding is done in exact integer arithmetic —
    ``⌊(2a·10⁶ + b) / 2b⌋`` is round-half-up of a/b at 6 dp — instead
    of ``round(double)``: engines disagree at half-ulp boundaries
    (Spark rounds the double's shortest decimal repr, DuckDB rounds
    x·10⁶ in float), which produced a genuine 1-in-5000-rows oracle
    flake on the composite score.  quality = 0.4·min(n/64,1) +
    0.3·(d/n) + 0.2·min(4s/n,1) + 0.1·min(c/8n,1) over the common
    denominator 3200n."""
    sw = ", ".join(f"'{w}'" for w in sorted({w for ws in LANG_STOPWORDS.values() for w in ws}))

    def r6(num: str, den: str) -> str:
        return f"cast((2 * ({num}) * 1000000 + ({den})) div (2 * ({den})) as double) / 1000000"

    return (
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.expr("cast(size(toks) as bigint)").alias("_n"),
            F.expr("cast(size(array_distinct(toks)) as bigint)").alias("_d"),
            F.expr(f"cast(size(filter(toks, qt -> qt in ({sw}))) as bigint)").alias("_s"),
            F.expr("cast(aggregate(toks, 0, (acc, qw) -> acc + length(qw)) as bigint)").alias("_c"),
        )
        .select(
            "doc_id",
            F.col("_n").cast("int").alias("n_tokens"),
            F.expr(r6("_d", "_n")).alias("distinct_ratio"),
            F.expr(r6("_s", "_n")).alias("stopword_ratio"),
            F.expr(r6("_c", "_n")).alias("mean_token_len"),
            F.expr(
                r6(
                    "20 * _n * least(_n, 64) + 960 * _d"
                    " + 640 * least(4 * _s, _n) + 40 * least(_c, 8 * _n)",
                    "3200 * _n",
                )
            ).alias("quality"),
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-voting language ID: argmax over per-language stopword
    hit counts; ties broken by language code (deterministic)."""
    toks = F.split("text", " ")
    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        scores.append(
            F.struct(
                F.size(F.expr(f"filter(split(text, ' '), lt -> lt in ({lst}))")).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max_by over (hits, lang): ties → lexicographically LAST lang; make
    # deterministic-ascending by negating nothing and ordering desc on
    # struct: greatest() picks max (hits, lang)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.greatest(*scores).getField("lang").alias("pred_lang"),
        F.greatest(*scores).getField("hits").alias("sw_hits"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic positional rolling fingerprint:
    fp = Σ_i (i+1)·(ascii(tok[i][0])·257 + len(tok[i]))  mod 1e9+7.
    A content fingerprint for shard-level dedup bookkeeping; exact SQL
    twin (no engine-specific hash functions)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        (
            F.expr(
                "aggregate(zip_with(split(text, ' '), sequence(1, size(split(text, ' '))),"
                " (ft, fi) -> fi * (ascii(substring(ft, 1, 1)) * 257 + length(ft))),"
                " 0L, (acc, fx) -> acc + fx)"
            )
            % FP_PRIME
        ).alias("fingerprint"),
    )
