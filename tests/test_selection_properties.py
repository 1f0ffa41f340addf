"""Property-based invariants for the data-selection family
(hypothesis), modelled in pure Python and checked against the
distributed implementations on randomized inputs:

- semantic dedup == model: assign each vector to its argmax-cosine
  centroid (tie -> lower cid), flag b iff some same-cluster a < b has
  cosine >= tau, survivors are the unflagged set;
- kNN classify == model: exact neighbor ranking by (cosine desc, id
  asc), majority label with smaller-label tie-break;
- snapshot-diff-style changelog (store_changelog) == dict-diff model
  over randomized upsert batches.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.functions.similarity import (
    knn_classify,
    semantic_dedup,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# small-dimension vectors with coarse coordinates: plenty of exact
# cosine ties (identical vectors), the hardest case for tie-breaks
vec = st.lists(
    st.sampled_from([0.0, 0.5, 1.0, 2.0]), min_size=3, max_size=3
).filter(lambda v: any(x != 0 for x in v))


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return d / (na * nb)


@settings(**SETTINGS)
@given(
    vecs=st.lists(vec, min_size=2, max_size=10),
    cents=st.lists(vec, min_size=1, max_size=3),
    tau=st.sampled_from([0.8, 0.95, 0.999]),
)
def test_semantic_dedup_matches_model(spark, vecs, cents, tau):
    data = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid long, cvec array<float>"
    )
    # model on float32-rounded inputs (the frames store array<float>)
    import numpy as np

    f32 = [list(np.array(v, dtype=np.float32).astype(float)) for v in vecs]
    c32 = [list(np.array(c, dtype=np.float32).astype(float)) for c in cents]
    assign = {
        i: max(range(len(c32)), key=lambda j: (_cos(v, c32[j]), -j))
        for i, v in enumerate(f32)
    }
    flagged = {
        b
        for b in range(len(f32))
        for a in range(b)
        if assign[a] == assign[b] and _cos(f32[a], f32[b]) >= tau
    }
    expect = sorted(set(range(len(f32))) - flagged)
    got = sorted(
        r["vec_id"] for r in semantic_dedup(data, cent, tau=tau).collect()
    )
    assert got == expect, (vecs, cents, tau, assign)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(vec, st.integers(min_value=0, max_value=3)),
        min_size=2,
        max_size=10,
    ),
    k=st.sampled_from([1, 3]),
)
def test_knn_classify_matches_model(spark, rows, k):
    import numpy as np

    data = spark.createDataFrame(
        [(i, v, lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    f32 = [list(np.array(v, dtype=np.float32).astype(float)) for v, _ in rows]
    labels = [lab for _, lab in rows]
    out = {
        r["vec_id"]: (r["predicted"], r["votes"], r["agrees"])
        for r in knn_classify(data, data, k=k).collect()
    }
    for q in range(len(rows)):
        ranked = sorted(
            (i for i in range(len(rows)) if i != q),
            key=lambda i: (-_cos(f32[i], f32[q]), i),
        )[:k]
        counts: dict[int, int] = {}
        for i in ranked:
            counts[labels[i]] = counts.get(labels[i], 0) + 1
        pred = min(counts, key=lambda lb: (-counts[lb], lb))
        assert out[q] == (pred, counts[pred], pred == labels[q]), (rows, k, q)


@settings(**SETTINGS)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),
                st.integers(min_value=-5, max_value=5),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=2,
        max_size=4,
    )
)
def test_store_changelog_matches_dict_model(spark, tmp_path_factory, batches):
    from nearscan_kafka_streams_spark.sinks.upsert import (
        foreach_batch_upsert,
        store_changelog,
    )

    target = str(tmp_path_factory.mktemp("cdcprop") / "store")
    upsert = foreach_batch_upsert(
        "account", target, order_cols=["ts"], num_buckets=4,
        retain_versions=len(batches),
    )
    # model tracks the FULL stored row (balance, ts): the changelog
    # compares whole rows, so a re-upsert with equal balance but newer
    # ts is still an update (the stored state genuinely changed) --
    # hypothesis caught a balance-only model missing exactly that
    state: dict[str, tuple[int, int]] = {}
    snapshots = []
    for bid, batch in enumerate(batches):
        # last-writer-wins within the batch on ts=position
        df = spark.createDataFrame(
            [(acc, val, i) for i, (acc, val) in enumerate(batch)],
            "account string, balance long, ts long",
        )
        upsert(df, bid)
        for i, (acc, val) in enumerate(batch):
            state[acc] = (val, i)
        snapshots.append(dict(state))

    got = {
        r["account"]: (
            r["change"],
            (r["before"]["balance"], r["before"]["ts"]) if r["before"] else None,
            (r["after"]["balance"], r["after"]["ts"]) if r["after"] else None,
        )
        for r in store_changelog(spark, target, 0, len(batches) - 1).collect()
    }
    first, last = snapshots[0], snapshots[-1]
    expect = {}
    for acc in set(first) | set(last):
        b, a = first.get(acc), last.get(acc)
        if acc not in first:
            expect[acc] = ("insert", None, a)
        elif acc not in last:
            expect[acc] = ("delete", b, None)
        elif b != a:
            expect[acc] = ("update", b, a)
    assert got == expect, (batches, snapshots)
