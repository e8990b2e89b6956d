"""P1/P2 sentence projection and C1 ngram space."""

import pyspark.sql.functions as F


def test_sentence_ids_unique(sentences):
    n = sentences.count()
    assert sentences.select("sentence_id").distinct().count() == n


def test_arrow_parser_equals_builtin(spark, raw, sentences):
    from snorkel_spark.operators.parser import parse_sentences_arrow

    a = parse_sentences_arrow(raw).select(
        "doc_id", "sentence_id", "position", "text", "n_tokens"
    )
    b = sentences.select("doc_id", "sentence_id", "position", "text", "n_tokens")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_ngram_count_formula(sentences, mentions):
    """#ngrams(sentence) = Σ_{n=1..n_max} max(0, L − n + 1)."""
    expected = sentences.selectExpr(
        "sentence_id",
        "greatest(n_tokens, 0) + greatest(n_tokens - 1, 0) as expected",
    )
    actual = mentions.groupBy("sentence_id").count()
    joined = expected.join(actual, "sentence_id", "left").fillna(0, ["count"])
    assert joined.filter("expected != count").count() == 0


def test_ngram_text_matches_bounds(mentions):
    bad = mentions.filter(
        "size(split(text, ' ')) != word_end - word_start + 1 or word_end >= n_tokens"
    )
    assert bad.count() == 0


def test_word_char_start(spark):
    from snorkel_spark.operators.parser import word_char_start

    df = spark.createDataFrame(
        [(["ab", "c", "def"], 0), (["ab", "c", "def"], 1), (["ab", "c", "def"], 2)],
        "tokens array<string>, idx int",
    )
    got = [r[0] for r in df.select(word_char_start("tokens", "idx")).collect()]
    assert got == [0, 3, 5]
