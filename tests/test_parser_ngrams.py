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


def test_parse_sentences_full_messy_text(spark):
    """Adversarial text: multi-sentence, punctuation, multi/leading/
    trailing spaces, empty runs — no empty tokens, stable ids."""
    from snorkel_spark.operators.parser import parse_sentences_full

    raw = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "Dr. Who met X.  He left!   Then,  (maybe) slept...", "media_ref": "", "offset": 0}]),
         ("d2", [{"kind": "text", "text": "   spaced   out   ", "media_ref": "", "offset": 0}]),
         ("d3", [{"kind": "text", "text": "!!!", "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    s = parse_sentences_full(raw)
    rows = {r["sentence_id"]: r for r in s.collect()}
    # d1 splits into: 'Dr.' | 'Who met X.' | 'He left!' | 'Then,  (maybe) slept...'
    d1 = sorted((r["sentence_id"], r["text"]) for r in rows.values() if r["doc_id"] == "d1")
    assert [t for _, t in d1] == ["Dr.", "Who met X.", "He left!", "Then,  (maybe) slept..."]
    assert rows["d1:0:0"]["tokens"] == ["Dr", "."]
    assert rows["d1:0:3"]["tokens"] == ["Then", ",", "(", "maybe", ")", "slept", ".", ".", "."]
    # multi-space never yields empty tokens; leading/trailing trimmed
    assert rows["d2:0:0"]["text"] == "spaced   out"
    assert rows["d2:0:0"]["tokens"] == ["spaced", "out"]
    # pure-terminator span: one run of '!!!', tokens are the glyphs
    assert rows["d3:0:0"]["tokens"] == ["!", "!", "!"]
    # no empty tokens anywhere
    import pyspark.sql.functions as F
    assert s.filter(F.array_contains("tokens", "")).count() == 0


def test_parse_sentences_robust_whitespace(spark):
    """The default parser collapses whitespace runs (no '' tokens)."""
    from snorkel_spark.operators.parser import parse_sentences

    raw = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "a  b   c", "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    r = parse_sentences(raw).collect()[0]
    assert r["tokens"] == ["a", "b", "c"] and r["n_tokens"] == 3


def test_ngram_split_tokens(spark):
    """split_tokens emits extra sub-spans for tokens containing the
    split chars, at the same word index, with distinct mention_ids."""
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.operators.parser import parse_sentences

    raw = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "anti-virus scan a/b", "media_ref": "", "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    m = ngram_mentions(parse_sentences(raw), n_max=1, split_tokens=("-", "/"))
    rows = m.collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == sorted(["anti-virus", "scan", "a/b", "anti", "virus", "a", "b"])
    sub = {r["text"]: (r["word_start"], r["word_end"]) for r in rows}
    assert sub["anti"] == (0, 0) and sub["virus"] == (0, 0)  # same word index as parent
    assert sub["a"] == (2, 2) and sub["b"] == (2, 2)
    assert len({r["mention_id"] for r in rows}) == len(rows)  # ids all distinct


def test_dictionary_length_pruning_identical_matches(spark, sentences, persons):
    """ngram_mentions(n_values=dict lengths) yields the SAME matcher
    output as full enumeration — the prune is result-invariant."""
    from snorkel_spark.operators.matchers import person_matcher
    from snorkel_spark.operators.ngrams import ngram_mentions
    from snorkel_spark.sources import fixtures as FX

    pm = person_matcher(FX.person_full_names(spark))
    lengths = pm.mention_lengths()
    assert lengths == [2]  # full-name gazetteer is bigrams only
    pruned = pm.apply(ngram_mentions(sentences, n_max=2, n_values=lengths))
    full = persons.select("mention_id")
    assert pruned.select("mention_id").exceptAll(full).count() == 0
    assert full.exceptAll(pruned.select("mention_id")).count() == 0
