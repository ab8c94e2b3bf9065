#!/usr/bin/env python3
"""spark-submit entry point for the full record-linkage pipeline.

Cluster launch (the north rule's deployment contract):

    cd /root/repo && zip -r /tmp/emspark.zip entity_matchers_spark
    spark-submit --master <cluster-or-local[N]> \\
        --py-files /tmp/emspark.zip \\
        jobs/run_pipeline.py --out /path/to/warehouse --entities 1000

The script only uses the SparkSession handed to it by spark-submit (no
master hard-coding), reads/generates the web-pages input, and runs the
checkpointed extract → blocks → pairs → scores → matches → clusters
pipeline; a rerun with the same --out resumes from the last committed
stage. Prints one JSON line with stage metrics + throughput so wrapper
tooling (bench, CI) can scrape results.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="warehouse root for stage tables")
    ap.add_argument("--entities", type=int, default=1000,
                    help="synthetic corpus size (entities); ignored with --input")
    ap.add_argument("--input", default=None,
                    help="parquet of (page_id,url,warc_ts,html,lang) web pages")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("entity-matchers-pipeline")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from entity_matchers_spark.corpus import web_pages
    from entity_matchers_spark.plans.pipeline import CheckpointedPipeline

    pages = (
        spark.read.parquet(args.input) if args.input else web_pages(spark, args.entities)
    )
    t0 = time.time()
    pipe = CheckpointedPipeline(spark, args.out)
    clusters = pipe.run(pages)
    n_clusters = clusters.select("cluster_id").distinct().count()
    n_rows = clusters.count()
    wall = round(time.time() - t0, 3)
    print(json.dumps({
        "rows": n_rows,
        "clusters": n_clusters,
        "wall_sec": wall,
        "rows_per_sec": round(n_rows / wall, 1) if wall else None,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
