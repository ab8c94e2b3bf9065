"""End-to-end acceptance tests (BASELINE.md targets).

- blocking pair-recall on planted duplicates
- pairwise F1 ≥ 0.99 on labeled pairs sharing a blocking key
- kill-and-rerun resume: identical final cluster table (FIXTURES.md §4)
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from entity_matchers_spark.corpus import labeled_pairs, web_pages
from entity_matchers_spark.operators import blocking, scoring
from entity_matchers_spark.operators.evaluation import pairwise_f1_from_clusters
from entity_matchers_spark.plans.pipeline import CheckpointedPipeline, PipelineConfig

N_ENTITIES = 250


@pytest.fixture(scope="module")
def corpus(spark):
    pages = web_pages(spark, N_ENTITIES).localCheckpoint()
    labels = labeled_pairs(spark, N_ENTITIES).withColumnRenamed("id_a", "id_a").localCheckpoint()
    return pages, labels


def test_blocking_recall_on_planted_duplicates(spark, corpus):
    pages, labels = corpus
    docs = pages.select(F.col("page_id").alias("id"), "url", "text")
    mh = blocking.minhash_block_keys(docs, "id", "text")
    metrics = blocking.blocking_metrics(mh, labels.where("label = 1")).first()
    assert metrics.pair_recall >= 0.98, metrics
    assert metrics.max_block is not None


def test_pairwise_f1_on_labeled_same_block_pairs(spark, corpus):
    """The BASELINE.json acceptance metric: score labeled pairs that share a
    blocking key, threshold, F1 ≥ 0.99."""
    pages, labels = corpus
    docs = pages.select(F.col("page_id").alias("id"), "text")
    blocks = blocking.minhash_block_keys(docs, "id", "text")
    cands = blocking.candidate_pairs(blocks, max_block_size=64)
    same_block = labels.join(cands, ["id_a", "id_b"], "left_semi")
    scored = scoring.score_pairs(same_block, docs)
    labeled_scored = scored.join(labels.select("id_a", "id_b", "label"), ["id_a", "id_b"])
    threshold, f1 = scoring.fit_threshold(labeled_scored)
    assert f1 >= 0.99, (threshold, f1)


def test_pipeline_resume_identical(spark, corpus, tmp_path_factory):
    pages, labels = corpus
    root_a = str(tmp_path_factory.mktemp("pipe_a"))
    root_b = str(tmp_path_factory.mktemp("pipe_b"))
    cfg = PipelineConfig()

    # full run
    full = CheckpointedPipeline(spark, root_a, cfg).run(pages)
    full_rows = sorted(tuple(r) for r in full.collect())

    # killed-after-stage-3 run: execute through 'scores', blow away nothing,
    # then resume with a FRESH pipeline object
    p1 = CheckpointedPipeline(spark, root_b, cfg)
    p1.run(pages, through="scores")
    assert p1.is_committed("scores") and not p1.is_committed("matches")
    resumed = CheckpointedPipeline(spark, root_b, cfg).run(pages)
    resumed_rows = sorted(tuple(r) for r in resumed.collect())

    assert full_rows == resumed_rows

    # cluster quality vs planted truth on the full run
    truth = labels.where("label = 1").select("id_a", "id_b")
    r = pairwise_f1_from_clusters(full, truth).first()
    assert r.f1 >= 0.99, (r.tp, r.n_align, r.n_truth, r.f1)

    shutil.rmtree(root_a, ignore_errors=True)
    shutil.rmtree(root_b, ignore_errors=True)
