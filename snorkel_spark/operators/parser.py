"""Sentence projection (SURVEY.md §2.2, P1/P2).

Reference: ``CorpusParser`` drives a spaCy pipeline per document and
persists per-sentence parallel arrays
(⚠ snorkel/parser/corpus_parser.py::CorpusParser ~L20–80,
⚠ snorkel/parser/spacy_parser.py::Spacy ~L30–150 — reconstructed, see
SURVEY.md §0).  Here a "sentence" is a text span of the interleaved
document (the synthesizer emits one sentence per text chunk), and
tokenization is whitespace splitting — exactly what the corpus'
word-salad text calls for, and fully expressible with JVM built-ins.

Two row-identical implementations are provided (see
``parse_sentences`` for the dispatch):

- ``parse_sentences_arrow`` — Arrow-batched ``mapInPandas``; the
  DEFAULT since r06 (compiled C string ops beat the interpreted
  higher-order-function closures ~2.7× cold — guide §4.2).
- ``parse_sentences_expr`` — pure built-in expressions (split/
  transform/filter), zero Python; use where Python workers are
  unavailable (``parse_sentences(raw, impl='expr')``).

Both emit the canonical schema:
    doc_id string, sentence_id string, position int, text string,
    n_tokens int, tokens array<string>, lemmas array<string>

Char offsets are *derived arithmetically on demand* (single-space
tokenization ⇒ char_start(word i) = Σ_{j<i} len(tok_j)+1) — see
``word_char_start`` — instead of being materialized per token, which
removes the widest column from every shuffle at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SENTENCE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("sentence_id", StringType()),
        StructField("position", IntegerType()),
        StructField("text", StringType()),
        StructField("n_tokens", IntegerType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("lemmas", ArrayType(StringType())),
    ]
)

# Rule lemmatizer (no spaCy offline — SURVEY.md §2.2 P2): lowercase,
# strip a plural-ish trailing 's' on words longer than 3 chars.
_LEMMA_EXPR = "transform(tokens, lt -> if(length(lt) > 3 and endswith(lt, 's'), substring(lt, 1, length(lt) - 1), lower(lt)))"


def parse_sentences(raw: DataFrame, impl: str = "arrow") -> DataFrame:
    """raw_documents → sentences.

    Tokenization is whitespace splitting with empty-token filtering —
    runs of spaces/tabs never produce '' tokens (on a clean
    single-spaced corpus this is byte-identical to split-on-space).
    For multi-sentence, punctuated text use ``parse_sentences_full``.

    Two row-identical implementations (equality-tested):
    ``impl='arrow'`` (default) batches the exploded spans through
    ``parse_sentences_arrow`` — guide §4.2: per-token work (split +
    lemma) runs as compiled C string ops on whole Arrow batches, which
    measured 2.7× faster cold and 1.3× warm than the interpreted
    higher-order-function expressions (Spark does not codegen lambda
    bodies, so the `transform` closures evaluate per element).
    ``impl='expr'`` keeps the pure-JVM expression plan
    (``parse_sentences_expr``) — zero Python processes, the right
    choice where Python workers are unavailable.
    """
    if impl == "arrow":
        return parse_sentences_arrow(raw)
    return parse_sentences_expr(raw)


def parse_sentences_expr(raw: DataFrame) -> DataFrame:
    """The pure built-in-expression P1 plan (no Python anywhere)."""
    return (
        raw.select("doc_id", F.explode("spans").alias("span"))
        .filter("span.kind = 'text' and span.text != ''")
        .select(
            "doc_id",
            F.concat_ws(":", "doc_id", F.col("span.offset")).alias("sentence_id"),
            F.col("span.offset").alias("position"),
            F.col("span.text").alias("text"),
        )
        .withColumn("tokens", F.filter(F.split("text", "\\s+"), lambda t: t != F.lit("")))
        .withColumns({"n_tokens": F.size("tokens"), "lemmas": F.expr(_LEMMA_EXPR)})
        .select("doc_id", "sentence_id", "position", "text", "n_tokens", "tokens", "lemmas")
    )


# Sentence runs: maximal [^.!?]+ stretches plus their trailing
# terminators.  No lookbehind — the same pattern runs under Java regex
# (Spark) and RE2 (DuckDB), so the SQL oracle splits identically.
# Known naivety vs a statistical splitter: abbreviation periods
# ("Dr.") terminate a sentence (⚠ the reference delegates this to
# spaCy's sentencizer — snorkel/parser/spacy_parser.py, reconstructed).
SENTENCE_RUN_RGX = "[^.!?]+[.!?]*|[.!?]+"
# Word-ish tokens or single punctuation glyphs (spaCy-style shape).
TOKEN_RGX = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"


def parse_sentences_full(raw: DataFrame) -> DataFrame:
    """P1 with real sentence splitting + punctuation-aware tokenization
    (SURVEY.md §2.2): each text span splits into sentences at
    ``[.!?]`` boundaries; tokens are alnum runs or single punctuation
    marks; whitespace runs and empty sentences are dropped.  All
    built-in expressions (regexp_extract_all / posexplode / filter) —
    zero Python, whole-stage codegen, and an exact DuckDB twin.

    sentence_id = doc_id:offset:sent_idx (sent_idx indexes the raw
    sentence runs, pre-filter, so ids are stable across both engines).
    """
    return (
        raw.select("doc_id", F.explode("spans").alias("span"))
        .filter("span.kind = 'text' and span.text != ''")
        .select(
            "doc_id",
            F.col("span.offset").alias("position"),
            # patterns passed as literal Columns — NOT interpolated into
            # SQL strings, where '\s' would be eaten by literal escaping
            F.posexplode(
                F.regexp_extract_all(F.col("span.text"), F.lit(SENTENCE_RUN_RGX), F.lit(0))
            ).alias("sent_idx", "sent_raw"),
        )
        .withColumn("text", F.trim(F.col("sent_raw")))
        .filter("text != ''")
        .withColumn(
            "tokens", F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RGX), F.lit(0))
        )
        .filter(F.size("tokens") > 0)
        .withColumns(
            {
                "sentence_id": F.concat_ws(":", "doc_id", "position", "sent_idx"),
                "n_tokens": F.size("tokens"),
                "lemmas": F.expr(_LEMMA_EXPR),
            }
        )
        .select("doc_id", "sentence_id", "position", "text", "n_tokens", "tokens", "lemmas")
    )


def parse_sentences_arrow(raw: DataFrame) -> DataFrame:
    """Same result via an Arrow-batched ``mapInPandas`` (vectorized pandas).

    Mirrors the reference's parse stage execution shape
    (⚠ snorkel/udf.py::UDFRunner.apply — worker processes pulling doc
    batches); in Spark the batch loop IS the executor task.

    Tokenization is BYTE-IDENTICAL to ``parse_sentences_expr``:
    split on ``\\s+`` compiled with ``re.ASCII`` (Java's ``\\s`` is the
    ASCII class unless UNICODE_CHARACTER_CLASS is set — Python's
    default would additionally split on U+00A0 etc.), empty tokens
    dropped, lemma rule ``w[:-1] if len>3 and endswith('s') else
    w.lower()`` exactly as the SQL transform.
    """
    exploded = raw.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.offset").alias("offset"),
    )
    # Right-size the Python tasks (guide §2.2 "fewer, larger map
    # tasks"): a tiny corpus spread over cores×4 partitions pays ~128
    # worker round-trips for sub-MB batches — measured 1.4 s/stage of
    # pure overhead at sf0.1.  Coalesce DOWN (never up) to
    # ~1 MB-of-estimated-input per task with a floor of
    # defaultParallelism/8 tasks; large inputs keep their native width
    # because the computed width exceeds it (coalesce is then a no-op).
    # The estimate is Catalyst's sizeInBytes (compressed-size-derived,
    # so the real per-task text is ~10–30× larger — still far below
    # batch-memory limits).
    try:
        import math

        est = int(exploded._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        floor = max(2, exploded.sparkSession.sparkContext.defaultParallelism // 8)
        width = max(floor, math.ceil(est / (1 << 20)))
        if width < exploded.rdd.getNumPartitions():
            exploded = exploded.coalesce(width)
    except Exception:
        pass  # estimation is best-effort; native width is always valid

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            # notna mirrors the expr path: "span.text != ''" drops NULL
            # rows in SQL; a pandas object-comparison would pass them
            # and crash the split
            t = pdf[(pdf["kind"] == "text") & pdf["text"].notna() & (pdf["text"] != "")]
            if len(t) == 0:
                continue
            toks = [
                [w for w in ws.split(s) if w] for s in t["text"].tolist()
            ]
            lemmas = [
                [w[:-1] if len(w) > 3 and w.endswith("s") else w.lower() for w in ts]
                for ts in toks
            ]
            yield pd.DataFrame(
                {
                    "doc_id": t["doc_id"],
                    "sentence_id": t["doc_id"] + ":" + t["offset"].astype(str),
                    "position": t["offset"].astype("int32"),
                    "text": t["text"],
                    "n_tokens": pd.Series(
                        [len(ts) for ts in toks], index=t.index, dtype="int32"
                    ),
                    "tokens": pd.Series(toks, index=t.index),
                    "lemmas": pd.Series(lemmas, index=t.index),
                }
            )

    return exploded.mapInPandas(parse, SENTENCE_SCHEMA)


# ---------------------------------------------------------------------
# Token-attribute columns: pos_tags / ner_tags parallel arrays — the
# reference ``Sentence`` schema contract LFs and NER matchers bind to
# (⚠ snorkel/models/context.py::Sentence ~L100–220 carries spaCy
# pos_tags/ner_tags; reconstructed — SURVEY.md §0).  No statistical
# tagger exists offline, so POS is an honest rule tagger (Penn-ish
# coarse tags, deterministic, byte-identical in Spark and DuckDB) and
# NER is gazetteer-driven.  Both are pure projections — no shuffle, no
# Python — so at 100 TB they ride the existing parse scan for free.
# ---------------------------------------------------------------------

# Engine-portable POS rule CASE: {w} = token slot, {re} = regex fn
# (Spark: regexp_like, DuckDB: regexp_matches — both partial-match, so
# patterns carry their own anchors).  Order matters: first hit wins.
POS_CASE_SQL = (
    "CASE WHEN {re}({w}, '^[0-9]+([.][0-9]+)?$') THEN 'CD'"
    " WHEN lower({w}) IN ('the', 'a', 'an') THEN 'DT'"
    " WHEN lower({w}) IN ('of', 'in', 'on', 'at', 'by', 'with', 'from', 'to') THEN 'IN'"
    " WHEN lower({w}) IN ('and', 'or', 'but') THEN 'CC'"
    " WHEN lower({w}) IN ('he', 'she', 'it', 'they', 'we', 'you', 'i') THEN 'PRP'"
    " WHEN {re}({w}, '^[^A-Za-z0-9]+$') THEN 'PUNCT'"
    " WHEN length({w}) > 4 AND {w} LIKE '%ing' THEN 'VBG'"
    " WHEN length({w}) > 4 AND {w} LIKE '%ed' THEN 'VBD'"
    " WHEN length({w}) > 3 AND {w} LIKE '%ly' THEN 'RB'"
    " WHEN {re}({w}, '^[A-Z]') THEN 'NNP'"
    " WHEN length({w}) > 3 AND {w} LIKE '%s' THEN 'NNS'"
    " ELSE 'NN' END"
)


def with_pos_tags(sentences: DataFrame) -> DataFrame:
    """Attach ``pos_tags`` (parallel to ``tokens``): rule POS tagger —
    numbers→CD, function words→DT/IN/CC/PRP, punctuation→PUNCT,
    -ing/-ed/-ly suffixes→VBG/VBD/RB, Capitalized→NNP, plural-ish→NNS,
    else NN.  Pure ``transform`` expression with an exact DuckDB twin
    (the same CASE via ``POS_CASE_SQL``)."""
    case = POS_CASE_SQL.format(w="pt", re="regexp_like")
    return sentences.withColumn(
        "pos_tags", F.expr(f"transform(tokens, pt -> {case})")
    )


def with_ner_tags(
    sentences: DataFrame,
    names: DataFrame,
    tag: str = "PERSON",
    alias_col: str = "alias",
    other: str = "O",
    method: str = "auto",
    max_inline: int = 50000,
) -> DataFrame:
    """Attach ``ner_tags`` (parallel to ``tokens``): gazetteer NER — a
    token is tagged iff it is part of a gazetteer name occurrence
    (1-token names: exact match; 2-token names: the token plus its
    left OR right neighbor forms the name).

    Two physically different plans behind one contract, auto-selected
    by gazetteer size (``method``: 'auto' | 'inline' | 'join'):

    * **inline** (gazetteer ≤ ``max_inline``): aliases are collected
      driver-side (same discipline as the broadcast alias dict) and
      embedded as literal hash maps → O(1) probes inside one
      ``transform`` projection, no shuffle.
    * **join** (larger): ``with_ner_tags_join`` — token-level
      broadcast-join + per-sentence reassembly; the gazetteer never
      touches the driver as Python literals.

    Both paths produce identical ner_tags (equality-tested) and mirror
    the reference's spaCy ``ner_tags`` array the NER matchers bind to
    (⚠ snorkel/matchers.py PersonMatcher =
    RegexMatchEach(attrib='ner_tags', rgx='PERSON') ~L290–330)."""
    if method == "auto":
        # bounded COLLECT, not a bounded scan: the distinct still
        # aggregates the whole names input (names tables are the small
        # side by construction), but at most max_inline+1 post-distinct
        # rows ever leave the executors
        n = names.select(alias_col).distinct().limit(max_inline + 1).count()
        method = "inline" if n <= max_inline else "join"
    if method == "join":
        return with_ner_tags_join(sentences, names, tag, alias_col, other)
    aliases = sorted({r[0] for r in names.select(alias_col).distinct().collect()})
    unis = [a for a in aliases if " " not in a]
    bis = [a for a in aliases if len(a.split(" ")) == 2]
    longer = [a for a in aliases if len(a.split(" ")) > 2]
    if longer:
        raise ValueError(f"with_ner_tags supports 1- and 2-token names; got {longer[:3]}")

    def lit_map(keys):
        pairs = []
        for k in keys:
            pairs.extend((F.lit(k), F.lit(True)))
        return F.create_map(*pairs) if pairs else None

    uni_map, bi_map = lit_map(unis), lit_map(bis)

    def tag_token(t, i):
        toks = F.col("tokens")
        cond = F.lit(False)
        if uni_map is not None:
            cond = cond | F.coalesce(F.map_contains_key(uni_map, t), F.lit(False))
        if bi_map is not None:
            nxt = F.concat(t, F.lit(" "), F.get(toks, i + F.lit(1)))
            prv = F.concat(F.get(toks, i - F.lit(1)), F.lit(" "), t)
            cond = cond | F.coalesce(F.map_contains_key(bi_map, nxt), F.lit(False))
            cond = cond | F.coalesce(F.map_contains_key(bi_map, prv), F.lit(False))
        return F.when(cond, F.lit(tag)).otherwise(F.lit(other))

    return sentences.withColumn("ner_tags", F.transform("tokens", tag_token))


# sentinel for "no neighbor token" in the join-path bigram keys — a
# control char no tokenizer emits, so it can never equal an alias part
_NO_NEIGHBOR = "\x01"


def with_ner_tags_join(
    sentences: DataFrame,
    names: DataFrame,
    tag: str = "PERSON",
    alias_col: str = "alias",
    other: str = "O",
) -> DataFrame:
    """The large-gazetteer NER path: identical semantics and output to
    the inline ``with_ner_tags`` plan, but the gazetteer stays a
    DataFrame end-to-end — no driver collect, no literal maps.

    Plan shape: tokens pos-explode once with their left/right-neighbor
    bigram keys built by ARRAY SHIFTS (no per-element indexing, so no
    ANSI index edge cases); three BROADCAST left joins probe the
    unigram and bigram alias dims in one stage; per-sentence
    ``collect_list(struct(pos, hit))`` + ``array_sort`` reassembles the
    parallel ner_tags array.  Shuffles: the reassembly groupBy + the
    attach join, both keyed on sentence_id (the corpus's natural key).
    At a gazetteer ≫ broadcast threshold, drop the ``F.broadcast``
    hints and the same plan degrades gracefully to shuffle hash joins
    keyed on the token — still no driver involvement."""
    dim = names.select(F.col(alias_col).alias("_alias")).distinct()
    # bounded probe (limit 1), mirroring the inline path's contract
    if dim.filter(F.size(F.split("_alias", " ")) > 2).limit(1).count():
        raise ValueError("with_ner_tags supports 1- and 2-token names")
    unis = dim.filter(~F.col("_alias").contains(" "))
    bis = dim.filter(F.size(F.split("_alias", " ")) == 2)

    ex = (
        sentences.select(
            "sentence_id",
            F.posexplode(
                F.arrays_zip(
                    F.col("tokens").alias("tok"),
                    F.concat(
                        F.array(F.lit(_NO_NEIGHBOR)),
                        F.expr("slice(tokens, 1, greatest(size(tokens) - 1, 0))"),
                    ).alias("prv_t"),
                    F.concat(
                        F.expr("slice(tokens, 2, size(tokens))"),
                        F.array(F.lit(_NO_NEIGHBOR)),
                    ).alias("nxt_t"),
                )
            ).alias("pos", "s"),
        )
        .filter(F.col("s.tok").isNotNull())
        .select(
            "sentence_id",
            "pos",
            F.col("s.tok").alias("tok"),
            F.concat(F.col("s.tok"), F.lit(" "), F.col("s.nxt_t")).alias("nxt"),
            F.concat(F.col("s.prv_t"), F.lit(" "), F.col("s.tok")).alias("prv"),
        )
    )
    uni_b = F.broadcast(unis.select(F.col("_alias").alias("tok"), F.lit(True).alias("_u")))
    nxt_b = F.broadcast(bis.select(F.col("_alias").alias("nxt"), F.lit(True).alias("_n")))
    prv_b = F.broadcast(bis.select(F.col("_alias").alias("prv"), F.lit(True).alias("_p")))
    hits = (
        ex.join(uni_b, "tok", "left")
        .join(nxt_b, "nxt", "left")
        .join(prv_b, "prv", "left")
        .select(
            "sentence_id",
            "pos",
            F.coalesce("_u", "_n", "_p", F.lit(False)).alias("hit"),
        )
    )
    tags = (
        hits.groupBy("sentence_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "hit"))).alias("_ph"))
        .select(
            "sentence_id",
            F.transform(
                "_ph", lambda x: F.when(x["hit"], F.lit(tag)).otherwise(F.lit(other))
            ).alias("ner_tags"),
        )
    )
    return sentences.join(tags, "sentence_id", "left").withColumn(
        "ner_tags",
        F.coalesce("ner_tags", F.transform("tokens", lambda _: F.lit(other))),
    )


# Function words for the shallow dependency heuristic.
_FUNC_WORDS = "('of', 'the', 'a')"


def with_dependencies(sentences: DataFrame) -> DataFrame:
    """Attach ``dep_parents``/``dep_labels`` parallel arrays — the
    Sentence schema hook dependency-context LFs need
    (⚠ snorkel/models/context.py::Sentence carries spaCy dep arrays;
    reconstructed — SURVEY.md §0).

    No statistical parser runs offline, so this is an HONEST shallow
    heuristic, not a real parse: token i attaches to the previous
    content token (function words 'of'/'the'/'a' are skipped one step),
    labels are 'root'/'prep'/'det'/'dep'.  The point is the column
    contract + the pure-expression shape (swap in a real parser via
    ``mapInPandas`` when one is available); LFs written against these
    columns run unchanged either way.
    """
    parents = F.expr(
        f"""
        transform(tokens, (dt, di) -> case
          when di = 0 then -1
          when di >= 2 and element_at(tokens, di) in {_FUNC_WORDS} then di - 2
          else di - 1 end)
        """
    )
    labels = F.expr(
        """
        transform(tokens, (dt, di) -> case
          when di = 0 then 'root'
          when dt = 'of' then 'prep'
          when dt in ('the', 'a') then 'det'
          else 'dep' end)
        """
    )
    return sentences.withColumn("dep_parents", parents).withColumn("dep_labels", labels)


def word_char_start(tokens_col: str, word_idx_col: str) -> F.Column:
    """Char offset of word *i* under single-space tokenization.

    ``aggregate`` over the token prefix — built-in fold, no Python.
    Replaces the reference's materialized ``char_offsets`` parallel array
    (⚠ snorkel/models/context.py::Sentence, SURVEY.md §1.1).
    """
    return F.expr(
        f"aggregate(slice({tokens_col}, 1, {word_idx_col}), 0, (acc, w) -> acc + length(w) + 1)"
    )
