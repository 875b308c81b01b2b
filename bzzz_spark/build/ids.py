"""Dense sequential id assignment without a single-partition window.

The naive ``row_number() OVER (ORDER BY ...)`` collapses the whole
table into one partition — a non-starter at 10^12 rows.  This helper
implements the scalable two-pass scheme:

  1. range-partition + sort by the (unique) order key;
  2. count rows per partition (the only collect — one row per partition);
  3. add ``base_offset[pid] + local_rank`` inside a streaming
     ``mapInPandas`` (narrow, order-preserving).

Spark's RangePartitioner samples with a partition-seeded deterministic
RNG, so the boundaries — and therefore the ids — are reproducible for
identical input.  The order key MUST be unique (ties that straddle a
partition boundary would make ranks ambiguous); the index build
guarantees this by deduplicating (conv_id, turn_idx) first.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` with a dense 0-based ``id_col`` in ``order_cols`` order."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # The count pass and the assign pass MUST see identical partition
    # boundaries.  RangePartitioner samples rows by position within the
    # upstream partitions, and upstream row order after a hash
    # aggregation is not guaranteed stable across jobs — so materialize
    # once and have both passes read the materialized blocks.  (The
    # on-disk build materializes each stage to Parquet anyway; this
    # covers the in-memory path.)
    arranged = arranged.persist()
    # Tiny collect: one row per partition.
    counts = {r["__pid"]: r["count"] for r in arranged.groupBy("__pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = T.StructType(
        [f for f in arranged.schema.fields if f.name != "__pid"]
        + [T.StructField(id_col, T.LongType(), False)]
    )

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            base = b_offsets.value[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns="__pid")
            pdf[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return arranged.mapInPandas(add_ids, schema=schema)
