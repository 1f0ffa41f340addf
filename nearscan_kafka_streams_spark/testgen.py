"""Deterministic distributed generator for NEAR-shaped pipeline input.

Builds receipts / execution_outcomes / action_receipt_actions tables of
any size entirely from ``spark.range`` + hash-derived column
expressions -- no driver-side data, no RNG state, bit-identical across
runs and partitionings.  Used by the flagship pipeline benchmark
(bench.py) and scale tests; FIXTURES.md handcrafted cases remain the
correctness corpus.

Distribution (hash-bucketed on receipt id):
  70% of receipts target the token contract; methods over the
  token-relevant set: 50% ft_transfer, 20% mint, 10% withdraw,
  10% ft_resolve_transfer, 10% unknown; 5% FAILURE outcomes; 5%
  duplicated CDC rows appended (exercises T1 dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.config import DEFAULT_CONFIG

T0_NS = 1_628_737_958_000_000_000  # 2021-08-12 in epoch ns
ACCOUNTS = 5000


def _bucket(id_col, seed: int, mod: int):
    return F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(mod))


def generate_near_tables(
    spark: SparkSession,
    n_receipts: int,
    token_address: str = DEFAULT_CONFIG.token_address,
    dup_fraction: float = 0.05,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    base = spark.range(n_receipts).select(F.col("id"))
    rid = F.concat(F.lit("r"), F.col("id"))
    ts = (F.lit(T0_NS) + F.col("id") * F.lit(1_000_000_000)).cast("decimal(20,0)")
    acct = lambda seed: F.concat(  # noqa: E731
        F.lit("acct"), _bucket(F.col("id"), seed, ACCOUNTS)
    )
    is_token = _bucket(F.col("id"), 1, 10) < 7

    receipts = base.select(
        rid.alias("receipt_id"),
        F.concat(F.lit("bh"), F.col("id")).alias("included_in_block_hash"),
        F.concat(F.lit("ch"), F.col("id")).alias("included_in_chunk_hash"),
        _bucket(F.col("id"), 2, 50).cast("int").alias("index_in_chunk"),
        ts.alias("included_in_block_timestamp"),
        acct(3).alias("predecessor_account_id"),
        F.when(is_token, F.lit(token_address))
        .otherwise(F.concat(F.lit("other"), _bucket(F.col("id"), 4, 100)))
        .alias("receiver_account_id"),
        F.lit("ACTION").alias("receipt_kind"),
        F.concat(F.lit("tx"), F.col("id")).alias(
            "originated_from_transaction_hash"
        ),
        F.lit(None).cast("string").alias("__deleted"),
    )

    outcomes = base.select(
        rid.alias("receipt_id"),
        F.concat(F.lit("ebh"), F.col("id")).alias("executed_in_block_hash"),
        (ts + F.lit(1_000_000_000)).cast("decimal(20,0)").alias(
            "executed_in_block_timestamp"
        ),
        _bucket(F.col("id"), 5, 50).cast("int").alias("index_in_chunk"),
        F.lit(3_000_000_000_000).cast("decimal(20,0)").alias("gas_burnt"),
        # string literal: 3e20 exceeds the JVM long F.lit() accepts
        F.lit(str(3 * 10**20)).cast("decimal(38,0)").alias("tokens_burnt"),
        F.lit(token_address).alias("executor_account_id"),
        F.when(_bucket(F.col("id"), 6, 20) == 0, F.lit("FAILURE"))
        .otherwise(F.lit("SUCCESS_VALUE"))
        .alias("status"),
        F.lit(1).cast("decimal(20,0)").alias("shard_id"),
        F.lit(None).cast("string").alias("__deleted"),
    )

    method_pick = _bucket(F.col("id"), 7, 10)
    # decimal multiply: (up to 1e6) * 1e18 overflows a JVM long
    amount = (_bucket(F.col("id"), 8, 1_000_000) + 1).cast("decimal(38,0)") * F.lit(
        10**18
    )
    amount_s = amount.cast("decimal(38,0)").cast("string")
    recv = F.concat(F.lit("acct"), _bucket(F.col("id"), 9, ACCOUNTS))
    args = (
        F.when(
            method_pick < 5,  # ft_transfer
            F.format_string(
                '{"gas":1,"deposit":"0","method_name":"ft_transfer",'
                '"args_json":{"receiver_id":"%s","amount":"%s"}}',
                recv,
                amount_s,
            ),
        )
        .when(
            method_pick < 7,  # mint
            F.format_string(
                '{"gas":1,"deposit":"0","method_name":"mint",'
                '"args_json":{"account_id":"%s","amount":"%s"}}',
                recv,
                amount_s,
            ),
        )
        .when(
            method_pick < 8,  # withdraw
            F.format_string(
                '{"gas":1,"deposit":"0","method_name":"withdraw",'
                '"args_json":{"recipient":"0x%s","amount":"%s"}}',
                recv,
                amount_s,
            ),
        )
        .when(
            method_pick < 9,  # ft_resolve_transfer
            F.format_string(
                '{"gas":1,"deposit":"0","method_name":"ft_resolve_transfer",'
                '"args_json":{"sender_id":"%s","receiver_id":"%s","amount":"%s"}}',
                acct(3),
                recv,
                amount_s,
            ),
        )
        .otherwise(  # unknown method -> 0 legs
            F.lit('{"gas":1,"deposit":"0","method_name":"ft_balance_of","args_json":{}}')
        )
    )

    actions = base.select(
        rid.alias("receipt_id"),
        F.lit(0).alias("index_in_action_receipt"),
        F.lit("FUNCTION_CALL").alias("action_kind"),
        args.alias("args"),
        acct(3).alias("receipt_predecessor_account_id"),
        F.when(is_token, F.lit(token_address))
        .otherwise(F.concat(F.lit("other"), _bucket(F.col("id"), 4, 100)))
        .alias("receipt_receiver_account_id"),
        ts.alias("receipt_included_in_block_timestamp"),
        F.lit(None).cast("string").alias("__deleted"),
    )

    # at-least-once duplicates: re-append a deterministic slice
    dup_mod = max(int(1 / dup_fraction), 1)
    dup = lambda df: df.union(  # noqa: E731
        df.where(_bucket(F.xxhash64(F.col("receipt_id")), 10, dup_mod) == 0)
    )
    return dup(receipts), dup(outcomes), dup(actions)


# word list for generated documents: hash-indexed, Zipf-skewed picks
_VOCAB = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "data", "model", "train", "token", "scale", "batch", "query", "join",
    "shuffle", "stream", "index", "vector", "graph", "cache", "store",
    "merge", "filter", "window", "state", "event", "count", "hash",
    "plan", "stage", "task", "node", "text", "word", "pair", "rank",
    "alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "theta",
    "river", "stone", "cloud", "field", "light", "sound", "metal", "glass",
    "north", "south", "east", "west", "rapid", "quiet", "sharp", "plain",
]


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    near_dup_fraction: float = 0.2,
    group_size: int = 10,
    words_per_doc: int = 50,
) -> DataFrame:
    """Deterministic documents table (same schema as testdata's) of any
    size, with a controllable near-duplicate rate so dedup families have
    real work at every scale.

    ``near_dup_fraction`` of docs share a per-group base text (group =
    ``group_size`` consecutive ids) and differ only in one trailing
    word -- MinHash/Jaccard near-dups but not byte-exact.  All content
    derives from xxhash64(seed, position): no driver data, no RNG state,
    bit-identical across partitionings.
    """
    base = spark.range(n_docs)
    is_near = _bucket(F.col("id"), 21, 1000) < int(near_dup_fraction * 1000)
    # near-dups draw words from the group leader's id; others from their own
    text_seed = F.when(
        is_near, (F.col("id") - F.pmod(F.col("id"), F.lit(group_size)))
    ).otherwise(F.col("id"))
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    # Zipf-ish mix matching real text entropy: ~25% stopwords from the
    # small common vocab, 75% from a large synthetic tail of LETTER
    # words (base-26 encoded ranks).  Two degenerate alternatives both
    # corrupt the stress signal: a tiny all-common vocab makes every doc
    # pair share most char shingles (LSH buckets explode quadratically),
    # and digit-suffixed tail words ("w12345") collapse the trigram
    # space to ~1000 digit grams.
    tail_vocab = 456_976  # 26^4 distinct 4-letter words
    letters = F.array(*[F.lit(c) for c in "abcdefghijklmnopqrstuvwxyz"])

    def _b26(idx, div):
        return F.element_at(
            letters, (F.pmod(F.floor(idx / F.lit(div)), F.lit(26)) + 1).cast("int")
        )

    def _word(pos):
        u = (
            F.pmod(F.xxhash64(text_seed, pos, F.lit(22)), F.lit(1_000_000))
            / 1_000_000.0
        )
        v = (
            F.pmod(F.xxhash64(text_seed, pos, F.lit(25)), F.lit(1_000_000))
            / 1_000_000.0
        )
        common = F.element_at(
            vocab, (F.floor(v * len(_VOCAB)) + 1).cast("int")
        )
        # u^3 skew: low ranks (frequent tail words) dominate, deep tail
        # stays reachable -- a Zipf-like rank-frequency curve
        rank = F.floor(F.pow(u, F.lit(3)) * tail_vocab)
        rare = F.concat(
            _b26(rank, 17_576), _b26(rank, 676), _b26(rank, 26), _b26(rank, 1)
        )
        return F.when(u < 0.25, common).otherwise(rare)

    body = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(words_per_doc)), _word), " "
    )
    text = F.when(
        is_near,
        F.concat(body, F.lit(" tail"), F.pmod(F.col("id"), F.lit(group_size))),
    ).otherwise(body)
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (_bucket(F.col("id"), 23, 3) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), _bucket(F.col("id"), 24, 20)).alias("source"),
        F.length(text).alias("n_chars"),
    )


def generate_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    n_clusters: int = 50,
) -> DataFrame:
    """Deterministic embeddings table (same schema as testdata's):
    cluster centroid + small per-vector noise, all hash-derived, so IVF
    has real cell structure to exploit at any scale."""
    base = spark.range(n_vecs)
    cid = F.pmod(F.col("id"), F.lit(n_clusters))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.pmod(F.xxhash64(cid, i, F.lit(31)), F.lit(2001)) - 1000)
            / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), i, F.lit(32)), F.lit(2001)) - 1000)
            / 5000.0
        ).cast("float"),
    )
    return base.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        cid.cast("int").alias("label"),
    )
