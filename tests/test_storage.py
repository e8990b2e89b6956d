"""Snapshot-table shim: commit/read/time-travel/lineage (S5/N4)."""

import pyspark.sql.functions as F

from snorkel_spark.storage import Catalog


def test_snapshot_time_travel(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    df1 = spark.range(5).withColumn("v", F.lit("a"))
    df2 = spark.range(7).withColumn("v", F.lit("b"))
    s1 = cat.write(df1, "t")
    s2 = cat.write(df2, "t")
    assert (s1, s2) == (1, 2)
    assert cat.current_snapshot("t") == 2
    assert cat.read(spark, "t").count() == 7           # latest wins
    assert cat.read(spark, "t", snapshot_id=1).count() == 5  # time travel
    assert cat.exists("t", 1) and not cat.exists("t", 9)
    assert [s["snapshot_id"] for s in cat.snapshots("t")] == [1, 2]
