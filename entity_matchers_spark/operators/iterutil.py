"""Loop-width sizing for iterative DataFrame algorithms.

Every iterative operator here (connected components, PageRank, HITS,
bootstrapping) runs a handful of joins + aggregations per round over a
frame that is usually ORDERS of magnitude smaller than the corpus (match
edges, entity graphs). Checkpointed frames carry no Catalyst size stats
(``LogicalRDD`` defaults to "huge"), so without intervention every round
runs full-session-width shuffles whose per-stage scheduling latency — not
data — dominates wall time 3-4× on small graphs (measured on the 582-edge
semdedup duplicate graph: 34.7 s → 9.9 s).

``loop_width`` turns one cheap count of the materialized loop input into a
partition width: ~1 partition per ``rows_per_partition`` rows, capped at
the session's shuffle width. Returns ``None`` (leave frames untouched)
when the input is big enough to want every core — so a 10^10-edge graph
keeps full parallelism and only the small-graph case narrows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def loop_width(
    spark: SparkSession,
    n_rows: int,
    rows_per_partition: int = 2_000_000,
) -> int | None:
    """Partitions for iterative loop frames, or None for session default."""
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = min(sess, 1 + n_rows // max(1, rows_per_partition))
    return None if w >= sess else w
