"""Corpus preprocessors (SURVEY.md §2.1 S1–S4).

Reference: ⚠ snorkel/parser/doc_preprocessors.py (reconstructed —
SURVEY.md §0): ``TSVDocPreprocessor`` (~L60–90), ``TextDocPreprocessor``
(~L90–120), ``CSVPathsPreprocessor`` (~L120–160),
``XMLMultiDocPreprocessor`` (~L160–220).

Each returns a DataFrame ``(doc_id string, text string)`` — the flat-doc
shape the reference yields as (Document, text); feed through
``interleaved.synthesize_raw_documents``-style wrapping or parse
directly.  All readers are Spark sources (distributed scan, pushdown);
the XML path chunks files through ``mapInPandas`` with stdlib
``xml.etree`` (no lxml offline).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tsv_doc_preprocessor(
    spark: SparkSession, path: str, max_docs: int | None = None
) -> DataFrame:
    """S1: one doc per line ``name\\ttext``."""
    df = (
        spark.read.option("sep", "\t")
        .schema("doc_id string, text string")
        .csv(path)
    )
    return df.limit(max_docs) if max_docs else df


def text_doc_preprocessor(spark: SparkSession, glob: str, max_docs: int | None = None) -> DataFrame:
    """S2: one doc per file; doc_id = file name."""
    df = (
        spark.read.text(glob, wholetext=True)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
    return df.limit(max_docs) if max_docs else df


def csv_paths_preprocessor(
    spark: SparkSession, paths_csv: str, reader=text_doc_preprocessor
) -> DataFrame:
    """S3: a CSV of file paths, each delegated to another preprocessor.
    The path list is small (driver-side union); each delegate scan is
    distributed."""
    paths = [r[0] for r in spark.read.csv(paths_csv).collect()]
    out = None
    for p in paths:
        d = reader(spark, p)
        out = d if out is None else out.unionByName(d)
    return out


def xml_multidoc_preprocessor(
    spark: SparkSession,
    glob: str,
    doc_tag: str = "document",
    id_tag: str = "id",
    text_tag: str = "passage",
) -> DataFrame:
    """S4: XML corpora (CDR/PubTator shape): one file, many <document>
    elements; stdlib ElementTree inside an Arrow-batched pass over
    (whole-file) rows."""
    files = spark.read.text(glob, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("xml")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for xml in pdf["xml"]:
                root = ET.fromstring(xml)
                for doc in root.iter(doc_tag):
                    did = doc.findtext(id_tag) or ""
                    texts = [e.text or "" for e in doc.iter(text_tag)]
                    rows.append((did, " ".join(t for t in texts if t)))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return files.mapInPandas(parse, "doc_id string, text string")
