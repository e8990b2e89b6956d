"""S7 interleaved table: schema, offsets, per-row span-sequence
invariant (BASELINE.json input_hint)."""

import pyspark.sql.functions as F

from tests.conftest import SF


def test_schema(raw):
    fields = dict((f.name, f.dataType.simpleString()) for f in raw.schema.fields)
    assert fields["doc_id"] == "string"
    assert (
        fields["spans"]
        == "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )


def test_offsets_are_positions(raw):
    from snorkel_spark.sources.interleaved import explode_spans

    ex = explode_spans(raw)
    assert ex.filter("pos != offset").count() == 0


def test_span_counts_formula(raw):
    # S = n_text + m_cnt + plant
    bad = raw.selectExpr(
        "cast(doc_id as bigint) as did", "size(spans) as s"
    ).filter(
        "s != cast(2 + did % 4 as int) + if(did % 3 = 0, cast(1 + did % 2 as int), 0)"
        " + if(did % 5 < 3, 1, 0)"
    )
    assert bad.count() == 0


def test_media_refs(raw):
    m = raw.select("doc_id", F.explode("spans").alias("s")).filter("s.kind != 'text'")
    bad = m.filter(
        "s.media_ref not like concat('media://', doc_id, '/%') or s.media_ref = ''"
    )
    assert bad.count() == 0
    # media only on did % 3 == 0 docs
    assert m.filter("cast(doc_id as bigint) % 3 != 0").count() == 0


def test_roundtrip_invariant(spark, raw):
    """Reassembled text chunks == original document text, per row."""
    from snorkel_spark.sources.interleaved import reassembled_text

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "cast(doc_id as string) doc_id", "text as orig"
    )
    joined = reassembled_text(raw).join(docs, "doc_id")
    assert joined.count() == 500
    assert joined.filter("text != orig").count() == 0
