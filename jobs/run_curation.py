#!/usr/bin/env python3
"""spark-submit entry point for the training-data curation pipeline.

Cluster launch (same deployment contract as jobs/run_pipeline.py):

    cd /root/repo && zip -r /tmp/emspark.zip entity_matchers_spark
    spark-submit --master <cluster-or-local[N]> \\
        --py-files /tmp/emspark.zip \\
        jobs/run_curation.py --out /path/to/warehouse --entities 1000

Reads (or synthesizes) a web-page corpus, extracts text, then runs the
checkpointed filter → scrub → dedup → select → pack chain; a rerun with
the same --out resumes from the last committed stage. Prints one JSON
line with per-stage rows + wall + packed-token throughput.
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
                    help="parquet of (id,url,lang,text) documents")
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("training-data-curation")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from entity_matchers_spark.plans.curation import CurationConfig, CurationPipeline

    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        from entity_matchers_spark.corpus import web_pages
        from entity_matchers_spark.extraction import with_extracted_text

        pages = web_pages(spark, args.entities)
        docs = with_extracted_text(pages, "html", "extracted_text").select(
            F.col("page_id").alias("id"), "url", "lang",
            F.col("extracted_text").alias("text"),
        )

    cfg = CurationConfig(seq_len=args.seq_len, n_shards=args.shards)
    t0 = time.time()
    packed = CurationPipeline(spark, args.out, cfg).run(docs)
    agg = packed.agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("tokens"),
        (F.max(F.col("start") + F.col("n_tok")) / args.seq_len).alias("seqs"),
    ).first()
    wall = round(time.time() - t0, 3)
    print(json.dumps({
        "docs_packed": agg.docs,
        "tokens_packed": int(agg.tokens or 0),
        "sequences": int(agg.seqs or 0),
        "wall_sec": wall,
        "tokens_per_sec": round((agg.tokens or 0) / wall, 1) if wall else None,
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
