"""Fuzzy-match join and retrieval-eval metric tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fuzzy_match_blocks_and_thresholds(spark, sf_dir):
    from nearscan_kafka_streams_spark.queries import fuzzy_match_parts

    out = fuzzy_match_parts(spark, sf_dir).toPandas()
    # every pair shares its blocking token and sits inside the band
    for _, r in out.iterrows():
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]
        assert 1 <= r["dist"] <= 4
        assert r["name_a"] < r["name_b"]  # canonical pair order, no dupes
    assert not out.duplicated(["name_a", "name_b"]).any()


def test_fuzzy_match_plan_is_blocked_not_cartesian(spark, sf_dir):
    from nearscan_kafka_streams_spark.plans.explain import formatted_plan
    from nearscan_kafka_streams_spark.queries import fuzzy_match_parts

    plan = formatted_plan(fuzzy_match_parts(spark, sf_dir))
    # the block key must drive an equi-join: hash/broadcast-hash, never
    # a cartesian or pure nested loop over all name pairs
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_retrieval_eval_self_consistency(spark, sf_dir):
    from nearscan_kafka_streams_spark.queries import retrieval_eval_metrics

    out = retrieval_eval_metrics(spark, sf_dir).toPandas()
    assert len(out) == 10  # one row per query
    assert ((out["hits"] >= 0) & (out["hits"] <= 5)).all()
    assert (out["recall_pct"] == out["hits"] * 20).all()
    # a first hit implies >= 1 hit and rank within top-5 (0 == no hit)
    hit_rows = out[out["hits"] > 0]
    assert ((hit_rows["first_hit_rank"] >= 1) & (hit_rows["first_hit_rank"] <= 5)).all()
    miss_rows = out[out["hits"] == 0]
    assert (miss_rows["first_hit_rank"] == 0).all()
    # 3-bit quantization is coarse but not random: the system should
    # still recover a majority of true neighbors overall
    assert out["hits"].sum() >= 25  # >= 50% aggregate recall


def test_retrieval_eval_exact_system_has_perfect_recall(spark, sf_dir):
    """Degenerate sibling: scoring the exact ranking against itself
    must yield recall 100 / first_hit_rank 1 for every query."""
    from nearscan_kafka_streams_spark.functions.similarity import (
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = brute_force_topk(emb, emb.where(F.col("vec_id") < 5), k=5).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("cid"),
        F.col("rank").alias("t_rank"),
    )
    s = t.select("qid", "cid", F.col("t_rank").alias("s_rank"))
    per_q = (
        s.join(t, ["qid", "cid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("hits"), F.min("s_rank").alias("fr"))
        .collect()
    )
    assert len(per_q) == 5
    for r in per_q:
        assert r["hits"] == 5 and r["fr"] == 1


def test_group_split_no_leakage(spark, sf_dir):
    """Every source lands wholly in one fold -- the property that
    row-level splits violate when near-dups share a source."""
    from nearscan_kafka_streams_spark.queries import group_split_documents

    out = group_split_documents(spark, sf_dir).toPandas()
    assert (out.groupby("source")["fold"].nunique() == 1).all()
    assert out["fold"].between(0, 4).all()
    assert (out["is_train"] == (out["fold"] != 0)).all()
    # determinism: a rerun produces the identical assignment
    again = group_split_documents(spark, sf_dir).toPandas()
    assert out.equals(again)


def test_curriculum_bins_partition_corpus(spark, sf_dir):
    from nearscan_kafka_streams_spark.queries import curriculum_bins_documents

    out = curriculum_bins_documents(spark, sf_dir).toPandas()
    assert list(out["tier"]) == [1, 2, 3, 4]
    # tiers are value-ordered and jointly exhaustive
    for i in range(3):
        assert out.loc[i, "hardest"] <= out.loc[i + 1, "easiest"]
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("length(trim(text)) > 0")
        .count()
    )
    assert out["n_docs"].sum() == n_docs
