"""Evaluation operators (SURVEY.md §2.6).

Set-based P/R/F1 with the reference's exact protocol: aligned pairs exclude
train pairs, truth = test+valid links
(/root/reference/src/utils.py:134-157, 183-204;
/root/reference/OpenEA_Mod/src/openea/modules/finding/evaluation.py:41-51).
Hits@k / MR / MRR over ranked candidates (alignment.py:151-177).
All as joins + counts — no driver-side set math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def precision_recall_f1(
    aligns: DataFrame,
    truth: DataFrame,
    exclude: DataFrame | None = None,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """One-row DataFrame (tp, n_align, n_truth, precision, recall, f1).

    ``exclude`` (train pairs) is anti-joined out of aligns first, mirroring
    src/utils.py:183-204.
    """
    ka, kb = keys
    a = aligns.select(ka, kb).distinct()
    t = truth.select(ka, kb).distinct()
    if exclude is not None:
        ex = exclude.select(ka, kb).distinct()
        a = a.join(ex, [ka, kb], "left_anti")
        t = t.join(ex, [ka, kb], "left_anti")
    stats = a.withColumn("_in_a", F.lit(1)).join(
        t.withColumn("_in_t", F.lit(1)), [ka, kb], "full"
    ).agg(
        F.sum(F.when(F.col("_in_a").isNotNull() & F.col("_in_t").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_in_a").isNotNull(), 1).otherwise(0)).alias("n_align"),
        F.sum(F.when(F.col("_in_t").isNotNull(), 1).otherwise(0)).alias("n_truth"),
    )
    return stats.select(
        "tp",
        "n_align",
        "n_truth",
        (F.col("tp") / F.col("n_align")).alias("precision"),
        (F.col("tp") / F.col("n_truth")).alias("recall"),
        (
            2 * (F.col("tp") / F.col("n_align")) * (F.col("tp") / F.col("n_truth"))
            / ((F.col("tp") / F.col("n_align")) + (F.col("tp") / F.col("n_truth")))
        ).alias("f1"),
    )


def pairwise_f1_from_clusters(
    clusters: DataFrame,
    truth_pairs: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Pairwise P/R/F1 of a clustering vs gold pairs: predicted pairs =
    all (a<b) pairs sharing a cluster. The cluster self-join is bounded by
    cluster sizes (match clusters are tiny)."""
    ka, kb = keys
    left = clusters.select(F.col(id_col).alias(ka), F.col(cluster_col).alias("_c"))
    right = clusters.select(F.col(id_col).alias(kb), F.col(cluster_col).alias("_c"))
    pred = left.join(right, "_c").where(F.col(ka) < F.col(kb)).drop("_c")
    return precision_recall_f1(pred, truth_pairs, keys=keys)


def hits_at_k(
    scored: DataFrame,
    truth: DataFrame,
    ks: tuple[int, ...] = (1, 5, 10),
    score_col: str = "score",
) -> DataFrame:
    """Ranking diagnostics per left id: hits@k, MR, MRR
    (alignment.py:151-177 semantics on the blocked candidate set).
    Gold pairs missing from candidates count as unranked (excluded from MR
    but hit@k = 0 — matches the reference's restriction to scored rows)."""
    w = Window.partitionBy("id_a").orderBy(F.col(score_col).desc(), F.col("id_b").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w))
    gold_ranked = truth.join(ranked, ["id_a", "id_b"], "left")
    # denominator is count(*) of the same aggregation — no separate
    # truth.count() job / embedded literal
    aggs = [F.count("*").alias("n_gold"), F.avg("rank").alias("mr"), F.avg(1 / F.col("rank")).alias("mrr")]
    for k in ks:
        aggs.append(
            (F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)) / F.count("*")).alias(f"hits_at_{k}")
        )
    return gold_ranked.agg(*aggs)


def assign_folds(
    pairs: DataFrame, n_folds: int = 5, keys: tuple[str, str] = ("id_a", "id_b"), salt: str = "folds-v1"
) -> DataFrame:
    """Deterministic fold assignment by seeded hash of the pair — the
    Spark-stable analog of the reference's random 70/20/10 x 5 folds
    (/root/reference/src/preprocess_datasets/create_k_folds.py:6-31)."""
    ka, kb = keys
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(ka).cast("string"), F.lit("|"), F.col(kb).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return pairs.withColumn("fold", (h % n_folds).cast("int"))


def kfold_prf1(
    aligns: DataFrame,
    truth: DataFrame,
    n_folds: int = 5,
    keys: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Per-fold P/R/F1 (one row per fold) of the alignment restricted to
    each fold vs the truth pairs of that fold — the reference's k-fold
    protocol (run_experiment.py:10-53) as a single grouped query."""
    ka, kb = keys
    a = assign_folds(aligns.select(ka, kb).distinct(), n_folds, keys)
    t = assign_folds(truth.select(ka, kb).distinct(), n_folds, keys)
    joined = a.withColumn("_in_a", F.lit(1)).join(
        t.withColumn("_in_t", F.lit(1)), [ka, kb, "fold"], "full"
    )
    per_fold = joined.groupBy("fold").agg(
        F.sum(F.when(F.col("_in_a").isNotNull() & F.col("_in_t").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_in_a").isNotNull(), 1).otherwise(0)).alias("n_align"),
        F.sum(F.when(F.col("_in_t").isNotNull(), 1).otherwise(0)).alias("n_truth"),
    )
    p = F.col("tp") / F.col("n_align")
    r = F.col("tp") / F.col("n_truth")
    return per_fold.select(
        "fold", "tp", "n_align", "n_truth",
        p.alias("precision"), r.alias("recall"),
        (2 * p * r / (p + r)).alias("f1"),
    )


def bcubed(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "id",
    quant: int = 10**9,
) -> DataFrame:
    """B-cubed clustering precision/recall/F1 (Bagga & Baldwin 1998) — the
    per-RECORD clustering metric the ER-evaluation literature recommends
    over pairwise F1 (pairwise over-weights big clusters; B-cubed weights
    every record equally):

        P_i = |cluster(i) ∩ class(i)| / |cluster(i)|   (averaged over i)
        R_i = |cluster(i) ∩ class(i)| / |class(i)|

    ``pred`` is (id, cluster_id), ``truth`` is (id, class_id); records
    present in both sides are scored.

    Determinism: each record's P_i/R_i is one integer division quantized to
    ``quant`` points, the averages are INTEGER sums of those points, and
    the final P/R/F floats are fixed-order expressions of the two sums —
    no order-dependent float reduction, so the oracle replays bit-for-bit.

    Scale shape: three partially-aggregated groupBys (cluster, class,
    cluster×class) + per-record joins on those keys; the final reduce is
    one row. Sum bound: quant·n < 2^63 for n up to ~9·10^9 records.
    """
    j = pred.select(F.col(id_col).alias("id"), "cluster_id").join(
        truth.select(F.col(id_col).alias("id"), "class_id"), "id"
    )
    c_sz = j.groupBy("cluster_id").agg(F.count("*").alias("c_n"))
    t_sz = j.groupBy("class_id").agg(F.count("*").alias("t_n"))
    ct_sz = j.groupBy("cluster_id", "class_id").agg(F.count("*").alias("ct_n"))
    q = F.lit(float(quant))
    per = (
        j.join(ct_sz, ["cluster_id", "class_id"])
        .join(c_sz, "cluster_id")
        .join(t_sz, "class_id")
        .select(
            F.round(q * F.col("ct_n") / F.col("c_n")).cast("long").alias("qp"),
            F.round(q * F.col("ct_n") / F.col("t_n")).cast("long").alias("qr"),
        )
    )
    agg = per.agg(
        F.count("*").alias("n"),
        F.sum("qp").alias("sp"),
        F.sum("qr").alias("sr"),
    )
    p = F.col("sp") / (F.col("n") * q)
    r = F.col("sr") / (F.col("n") * q)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(p, 6).alias("bcubed_p"),
        F.round(r, 6).alias("bcubed_r"),
        F.round(
            F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0)), 6
        ).alias("bcubed_f1"),
    )
