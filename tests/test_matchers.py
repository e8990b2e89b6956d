"""M1–M9 matcher algebra (SURVEY.md §2.4) incl. De Morgan laws and
longest-match maximality."""

import pandas as pd
import pytest

from snorkel_spark.operators.matchers import (
    Concat,
    DictionaryMatch,
    Intersect,
    Inverse,
    LambdaFunctionMatcher,
    NumberMatcher,
    RegexMatchEach,
    RegexMatchSpan,
    Union,
    maximal_only,
)


@pytest.fixture(scope="module")
def toy_mentions(spark):
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.operators.parser import SENTENCE_SCHEMA

    rows = [
        ("d1", "d1:0", 0, "alice smith married bob jones", 5,
         ["alice", "smith", "married", "bob", "jones"],
         ["alice", "smith", "married", "bob", "jone"]),
        ("d2", "d2:0", 0, "total 12 34 units", 4,
         ["total", "12", "34", "units"], ["total", "12", "34", "unit"]),
    ]
    sents = spark.createDataFrame(rows, SENTENCE_SCHEMA)
    return ngram_mentions(sents, n_max=3).cache()


def _texts(df):
    return sorted(r["text"] for r in df.select("text").collect())


def test_dictionary_match(toy_mentions):
    m = DictionaryMatch(d={"alice smith", "bob jones"})
    assert _texts(m.apply(toy_mentions)) == ["alice smith", "bob jones"]


def test_regex_span_and_each(toy_mentions):
    assert _texts(RegexMatchSpan(rgx=r"\w+ married").apply(toy_mentions)) == ["smith married"]
    nums = RegexMatchEach(rgx=r"[0-9]+").apply(toy_mentions)
    assert _texts(nums) == ["12", "12 34", "34"]
    assert _texts(NumberMatcher().apply(toy_mentions)) == ["12", "12 34", "34"]


def test_union_intersect_inverse_demorgan(toy_mentions):
    a = RegexMatchSpan(rgx=r".*alice.*")
    b = RegexMatchSpan(rgx=r".*bob.*")
    u = Union(children=[a, b]).apply(toy_mentions)
    i = Intersect(children=[a, b]).apply(toy_mentions)
    # ¬(A ∪ B) == ¬A ∩ ¬B
    lhs = Inverse(child=Union(children=[a, b])).apply(toy_mentions)
    rhs = Intersect(children=[Inverse(child=a), Inverse(child=b)]).apply(toy_mentions)
    assert _texts(lhs) == _texts(rhs)
    assert set(_texts(i)).issubset(set(_texts(u)))


def test_longest_match_only(toy_mentions):
    m = DictionaryMatch(d={"alice", "alice smith", "bob jones", "12"})
    out = m.apply(toy_mentions)
    assert set(_texts(out)) == {"alice", "alice smith", "bob jones", "12"}
    longest = DictionaryMatch(d={"alice", "alice smith", "bob jones", "12"},
                              longest_match_only=True).apply(toy_mentions)
    # 'alice' is contained in 'alice smith' → dropped
    assert set(_texts(longest)) == {"alice smith", "bob jones", "12"}


def test_maximal_only_keeps_duplicates_of_equal_span(toy_mentions):
    out = maximal_only(toy_mentions)
    # every 3-gram survives (nothing contains it)
    assert out.filter("n = 3").count() == toy_mentions.filter("n = 3").count()


def test_concat(toy_mentions):
    left = DictionaryMatch(d={"alice smith"})
    right = DictionaryMatch(d={"married"})
    out = Concat(left=left, right=right).apply(toy_mentions)
    assert _texts(out) == ["alice smith married"]
    row = out.collect()[0]
    assert (row["word_start"], row["word_end"]) == (0, 2)


def test_lambda_matcher(toy_mentions):
    m = LambdaFunctionMatcher(func=lambda s: s.str.startswith("total"))
    got = _texts(m.apply(toy_mentions))
    assert "total" in got and all(t.startswith("total") for t in got)


def test_person_matcher_on_fixture(persons):
    # fixture persons are exactly the planted full-name bigrams
    assert persons.filter("n != 2").count() == 0
    assert persons.filter(
        "text not rlike '^(anna[0-9]+ lee[0-9]+|bob[0-9]+ kim[0-9]+)$'"
    ).count() == 0


def test_porter_dictionary_match(spark, mentions):
    """stemmer='porter': inflected dict forms match differently-
    inflected spans via shared stems (marries/married → marri)."""
    from snorkel_spark.operators.matchers import DictionaryMatch, porter_stem_word

    assert porter_stem_word("marries") == "marri" == porter_stem_word("married")
    assert porter_stem_word("wifes") == "wife"
    assert porter_stem_word("agreed") == "agree"   # eed → ee
    assert porter_stem_word("joining") == "join"   # ing → ε
    assert porter_stem_word("caress") == "caress"  # ss unchanged
    m = DictionaryMatch(d={"marries"}, stemmer="porter").apply(mentions)
    got = {r["text"] for r in m.select("text").distinct().collect()}
    assert got == {"married"}
