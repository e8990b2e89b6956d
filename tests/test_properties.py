"""Property-based tests (SURVEY.md §5.2.5) via hypothesis.

One Spark job per property: hypothesis generates a batch of sentences
in a single example (``@settings(max_examples=1)`` with large lists
would weaken shrinking, so we use a handful of examples over a pure
pandas/py mirror where possible and a single batched Spark check for
the DataFrame laws).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.text(alphabet="abcxyz", min_size=1, max_size=4)
sentences_strategy = st.lists(
    st.lists(words, min_size=1, max_size=8), min_size=1, max_size=12
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(sentences_strategy)
def test_ngram_count_formula_property(spark, sents):
    """#ngrams(L, n_max) == Σ_{n≤n_max} max(0, L−n+1) for random token
    lists (C1 invariant)."""
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.operators.parser import SENTENCE_SCHEMA

    rows = [
        (f"d{i}", f"d{i}:0", 0, " ".join(toks), len(toks), toks, toks)
        for i, toks in enumerate(sents)
    ]
    df = spark.createDataFrame(rows, SENTENCE_SCHEMA)
    got = {
        r["sentence_id"]: r["count"]
        for r in ngram_mentions(df, n_max=3).groupBy("sentence_id").count().collect()
    }
    for i, toks in enumerate(sents):
        L = len(toks)
        want = sum(max(0, L - n + 1) for n in (1, 2, 3))
        assert got.get(f"d{i}:0", 0) == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(sentences_strategy, st.sets(words, min_size=1, max_size=5))
def test_longest_match_idempotent_and_maximal(spark, sents, dict_words):
    """maximal_only is idempotent and its output has no strict
    containment pairs (M1 law)."""
    from snorkel_spark.operators.matchers import DictionaryMatch, maximal_only
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.operators.parser import SENTENCE_SCHEMA

    rows = [
        (f"d{i}", f"d{i}:0", 0, " ".join(toks), len(toks), toks, toks)
        for i, toks in enumerate(sents)
    ]
    df = ngram_mentions(spark.createDataFrame(rows, SENTENCE_SCHEMA), n_max=3)
    m = DictionaryMatch(d=dict_words, longest_match_only=True).apply(df)
    rows = m.select("sentence_id", "word_start", "word_end").collect()
    by_sent = {}
    for r in rows:
        by_sent.setdefault(r["sentence_id"], []).append((r["word_start"], r["word_end"]))
    for spans in by_sent.values():
        for a in spans:
            for b in spans:
                if a != b:
                    assert not (b[0] <= a[0] and a[1] <= b[1])  # no strict containment
    again = maximal_only(m)
    assert again.count() == m.count()


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 6), st.sampled_from([-1, 1])),
        min_size=1, max_size=60,
    )
)
def test_majority_vote_bounds_property(spark, rows):
    """MV prob is 1/0.5/0 by the sign of the deduped vote sum (G5 law)."""
    import pandas as pd

    from snorkel_spark.labelmodel.model import majority_vote

    pdf = pd.DataFrame(rows, columns=["cand", "lf_id", "label"]).drop_duplicates(
        ["cand", "lf_id"]
    )
    pdf["candidate_id"] = pdf["cand"].map(lambda c: f"c{c}")
    sdf = spark.createDataFrame(pdf[["candidate_id", "lf_id", "label"]])
    got = {r["candidate_id"]: r["prob_true"] for r in majority_vote(sdf).collect()}
    want = {}
    for cid, grp in pdf.groupby("candidate_id"):
        s = grp["label"].sum()
        want[cid] = 1.0 if s > 0 else (0.0 if s < 0 else 0.5)
    assert got == want


def test_porter_python_twin_matches_duckdb_rules():
    """Property: the Python porter_stem_word twin and the portable SQL
    CASE rules (DuckDB spelling) agree on every word — the guarantee
    that dictionary-side (Python) and span-side (SQL) normalization
    can never drift."""
    import duckdb

    from snorkel_spark.operators.matchers import porter_span_sql, porter_stem_word

    # suffix-focused word set: every rule boundary plus random-ish stems
    stems = ["marr", "wiv", "caress", "agre", "join", "cri", "s", "as",
             "mass", "pon", "feed", "bleed", "sing", "thing", "x"]
    sufs = ["", "s", "ss", "es", "ies", "sses", "ed", "eed", "ing", "ings"]
    words = sorted({st + su for st in stems for su in sufs} | {"a", "I", "Dr"})
    expr = porter_span_sql(
        "w", transform_fn="list_transform", split_fn="string_split",
        join_fn="array_to_string",
    )
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    got = dict(con.execute(
        f"SELECT w, {expr} FROM (VALUES {vals}) t(w)"
    ).fetchall())
    for w in words:
        assert got[w] == porter_stem_word(w), (w, got[w], porter_stem_word(w))
