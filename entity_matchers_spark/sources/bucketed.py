"""Bucketed-table layout: pre-shuffled storage for co-located joins.

At 10^12 documents the ER chain joins the same keys repeatedly (candidate
pairs ⋈ features ⋈ scores ⋈ clusters, incremental re-linkage against the
existing corpus). Each sort-merge join normally pays a full shuffle of both
sides; writing the hot tables bucketed by the join key pays that shuffle
ONCE at write time — every later equi-join on the key reads co-located
buckets and the Exchange disappears from the plan entirely (verified by
``tests/test_sources_triples_graph.py::test_bucketed_join_has_no_exchange``).

This is the parquet/catalog analog of the reference pipeline's pattern of
persisting intermediate alignment tables between stages
(/root/reference/bert-int/run_full_bert.py:46-64 — each stage reloads the
previous stage's pickle); on Iceberg the same layout is a bucket partition
transform (``bucket(N, key)``) with identical join-planning benefits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    Bucket count is a layout contract: every table that will be joined
    against this one co-location-free must use the SAME bucket count on
    the join key. Sorting inside buckets additionally removes the
    sort step of a sort-merge join. ``path`` makes the table external
    (files live there; only metadata in the catalog).
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sorted_by_key:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Equi-join two tables bucketed on ``key`` with equal bucket counts —
    plans as a zero-Exchange sort-merge join (each task reads bucket i of
    both sides). The caller owns the layout contract; Spark falls back to
    a normal shuffled join if the bucket specs don't line up."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
