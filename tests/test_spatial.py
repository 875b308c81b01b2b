"""Spatial filter + distance sort (reference Q18/T5:
src/bzzz/index_spatial.clj:29-32, expr.clj:19-23; geo tests at
core_test.clj:739-782).  Distances are checked against an independent
pure-Python haversine."""

import math

import pytest
from pyspark.sql import functions as F

from bzzz_spark.build.indexer import IndexConfig, build_index
from bzzz_spark.query import ast
from bzzz_spark.query.spatial import haversine_m, spatial_filter_search

R = 6371008.8


def py_haversine(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlon) ** 2
    return 2 * R * math.asin(math.sqrt(a))


def test_haversine_known_distances(spark):
    # Paris (48.8566, 2.3522) → Berlin (52.52, 13.405) ≈ 877.46 km
    df = spark.createDataFrame([(48.8566, 2.3522)], "lat double, lon double")
    got = df.select(
        haversine_m(F.col("lat"), F.col("lon"), 52.52, 13.405).alias("d")
    ).collect()[0]["d"]
    assert abs(got - py_haversine(48.8566, 2.3522, 52.52, 13.405)) < 1e-6
    assert 865_000 < got < 890_000
    # zero distance
    z = df.select(haversine_m(F.col("lat"), F.col("lon"), 48.8566, 2.3522).alias("d"))
    assert z.collect()[0]["d"] < 1e-6


@pytest.fixture(scope="module")
def geo_index(spark, small_transcripts):
    # deterministic lat/lon derived from the key (same trick as the
    # driver contract: the corpus ships no coordinates)
    geo = small_transcripts.withColumn(
        "lat",
        (F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(160)) - 80 + 0.25)
        .cast("double"),
    ).withColumn(
        "lon",
        (F.pmod(F.xxhash64("turn_idx", "conv_id"), F.lit(340)) - 170 + 0.25)
        .cast("double"),
    )
    idx = build_index(
        geo, IndexConfig(block_size=16, segment_size=64, num_partitions=4)
    )
    idx.docs.cache().count()
    idx.postings.cache().count()
    return idx


def test_spatial_filter_and_distance_sort(geo_index, small_oracle):
    center, radius = (10.25, 20.25), 8_000_000
    rows = spatial_filter_search(
        geo_index, ast.Term("the"), center, radius, size=1000,
        sort_by_distance=True,
    ).collect()
    assert rows, "radius should catch some matches"
    # reconstruct expected from the engine's own docs table +
    # independent python haversine
    locs = {
        r["docid"]: (r["lat"], r["lon"])
        for r in geo_index.docs.select("docid", "lat", "lon").collect()
    }
    matched = small_oracle.execute(ast.Term("the"))
    want = []
    for d in matched:
        dist = py_haversine(*locs[d], *center)
        if dist <= radius:
            want.append((d, dist))
    want.sort(key=lambda x: (x[1], x[0]))
    assert [r["docid"] for r in rows] == [d for d, _ in want]
    for r, (_, wd) in zip(rows, want):
        assert abs(r["distance_m"] - wd) < 1e-6
    # distances ascending
    ds = [r["distance_m"] for r in rows]
    assert ds == sorted(ds)


def test_spatial_filter_is_nonscoring(geo_index, small_oracle):
    """The spatial predicate restricts matches but scores stay BM25
    (Lucene Filter semantics)."""
    center, radius = (10.25, 20.25), 8_000_000
    rows = spatial_filter_search(
        geo_index, ast.Term("the"), center, radius, size=50,
    ).collect()
    scored = small_oracle.execute(ast.Term("the"))
    for r in rows:
        assert math.isclose(r["score"], scored[r["docid"]], rel_tol=1e-9)
    # score-desc order
    ss = [r["score"] for r in rows]
    assert ss == sorted(ss, reverse=True)


def test_spatial_empty_radius(geo_index):
    out = spatial_filter_search(
        geo_index, ast.Term("the"), (0.126, 0.126), 1.0, size=10
    )
    assert out.count() == 0
