"""Streaming ops (batch == streaming under AvailableNow) and the S1–S4
corpus preprocessors."""

import os

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_windowed_counts_batch_vs_streaming(spark, events, tmp_path_factory):
    from snorkel_spark.streaming.events import (
        run_stream_to_memory, windowed_counts, windowed_counts_streaming,
    )

    batch = windowed_counts(events)
    sdf = windowed_counts_streaming(spark, f"{SF}/events.parquet")
    got = run_stream_to_memory(spark, sdf, "wc_test")
    assert batch.exceptAll(got).count() == 0
    assert got.exceptAll(batch).count() == 0


def test_sessionize(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 10)),
        (1, dt.datetime(2024, 1, 1, 2, 0)),   # gap > 30min → new session
        (2, dt.datetime(2024, 1, 1, 5, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from snorkel_spark.streaming.events import sessionize

    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sessionize(df).collect()}
    assert got == {1: (2, 3), 2: (1, 1)}


def test_tsv_and_text_preprocessors(spark, tmp_path_factory):
    from snorkel_spark.sources.preprocessors import (
        csv_paths_preprocessor, text_doc_preprocessor, tsv_doc_preprocessor,
    )

    d = tmp_path_factory.mktemp("docs")
    tsv = d / "docs.tsv"
    tsv.write_text("doc1\thello world\ndoc2\tsecond doc\n")
    out = tsv_doc_preprocessor(spark, str(tsv))
    assert {(r["doc_id"], r["text"]) for r in out.collect()} == {
        ("doc1", "hello world"), ("doc2", "second doc"),
    }
    assert tsv_doc_preprocessor(spark, str(tsv), max_docs=1).count() == 1

    (d / "a.txt").write_text("file a text")
    (d / "b.txt").write_text("file b text")
    out2 = text_doc_preprocessor(spark, str(d / "*.txt"))
    got = {(r["doc_id"], r["text"]) for r in out2.collect()}
    assert got == {("a.txt", "file a text"), ("b.txt", "file b text")}

    paths = d / "paths.csv"
    paths.write_text(f"{d}/a.txt\n{d}/b.txt\n")
    out3 = csv_paths_preprocessor(spark, str(paths))
    assert out3.count() == 2


def test_xml_preprocessor(spark, tmp_path_factory):
    from snorkel_spark.sources.preprocessors import xml_multidoc_preprocessor

    d = tmp_path_factory.mktemp("xml")
    (d / "c.xml").write_text(
        "<collection>"
        "<document><id>d1</id><passage>text one</passage><passage>more</passage></document>"
        "<document><id>d2</id><passage>text two</passage></document>"
        "</collection>"
    )
    out = xml_multidoc_preprocessor(spark, str(d / "*.xml"))
    got = {(r["doc_id"], r["text"]) for r in out.collect()}
    assert got == {("d1", "text one more"), ("d2", "text two")}


def test_hot_path_discipline():
    """BASELINE.md: no row-at-a-time Python UDFs / rdd.map in pipeline
    modules — only pandas/Arrow UDFs, mapInPandas, built-ins."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "snorkel_spark"
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if ".rdd.map(" in src or "F.udf(" in src or "@udf(" in src:
            offenders.append(str(p))
    assert offenders == []


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionization ≡ batch sessionize: the
    GroupState-carried totals' final update equals the batch result."""
    import pyspark.sql.functions as F

    from snorkel_spark.streaming.events import (
        run_stream_updates_to_memory,
        sessionize,
        sessionize_stateful_streaming,
    )
    from tests.conftest import SF

    path = f"{SF}/events.parquet"
    batch = {
        (r["user_id"], r["n_sessions"], r["n_events"])
        for r in sessionize(spark.read.parquet(path)).collect()
    }
    sdf = sessionize_stateful_streaming(spark, path)
    mem = run_stream_updates_to_memory(spark, sdf, "sess_state")
    # keep the last update per user (multiple micro-batches possible)
    final = mem.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("n_sessions").alias("n_sessions")
    )
    got = {(r["user_id"], r["n_sessions"], r["n_events"]) for r in final.collect()}
    assert got == batch


def test_stateful_sessionize_out_of_order_chunks(spark, tmp_path):
    """Events delivered out of time order across MULTIPLE Arrow chunks
    of the same micro-batch must still sessionize like batch: the
    operator concatenates + sorts all chunks before the gap diff, so a
    tiny maxRecordsPerBatch (forcing many chunks per group) changes
    nothing."""
    import pyspark.sql.functions as F

    from snorkel_spark.streaming.events import (
        run_stream_updates_to_memory,
        sessionize,
        sessionize_stateful_streaming,
    )

    # one user, 12 events in 3 sessions (gap 30 min), written REVERSED
    ts = []
    base = 1_600_000_000
    for s in range(3):
        for i in range(4):
            ts.append(base + s * 7200 + i * 60)  # 2h between sessions
    rows = [(1, t) for t in reversed(ts)]
    df = spark.createDataFrame(rows, "user_id long, ts_s long").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    path = str(tmp_path / "ooo_events.parquet")
    df.coalesce(1).write.parquet(path)

    batch = {(r["user_id"], r["n_sessions"], r["n_events"])
             for r in sessionize(spark.read.parquet(path)).collect()}
    assert batch == {(1, 3, 12)}

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        sdf = sessionize_stateful_streaming(spark, path)
        mem = run_stream_updates_to_memory(spark, sdf, "sess_state_ooo")
        final = mem.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max("n_sessions").alias("n_sessions"),
        )
        got = {(r["user_id"], r["n_sessions"], r["n_events"])
               for r in final.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == batch
