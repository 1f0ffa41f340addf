"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the standing contract (reverify lane
first, then new, then changed, then the oldest-green backlog /
oldest-green fill) so a stray re-registration can't silently push an
unverified entry out of the driver's sampling window.  Round-10 lanes
are the current front; the round-7/8/9 lists remain in
queries/_registry.py as the backlog's provenance."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def test_front_lanes_lead_the_registry_in_order():
    front = (
        list(Q._REVERIFY_R10)
        + list(Q._ROUND10_NEW)
        + list(Q._CHANGED_R10)
        + list(Q._STALE_R10)
    )
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_round10_front_is_exactly_the_sample_budget():
    # 12 changed + 31 round-5-green + 7 round-6-green = 50: one driver
    # sample retires the round-5 backlog entirely, and the oldest
    # driver-green anywhere advances to round 6 (round-9 verdict
    # item 5)
    front = (
        list(Q._REVERIFY_R10)
        + list(Q._ROUND10_NEW)
        + list(Q._CHANGED_R10)
        + list(Q._STALE_R10)
    )
    assert len(front) == 50
    assert len(Q._STALE_R10) == 38


def test_changed_lane_is_the_jaccard_family_plus_census_params():
    # round-9 verdict item 1: prefix_ext="auto" becomes the default,
    # re-planning the registered producer, its six staged-edge
    # consumers, and corpus_clean_pipeline's direct survivor
    # self-join; item 4 adds stats_out census params to
    # containment_join / winnowed_spans (executed plan identical when
    # unset, fronted under the "code changed => green history stale"
    # standard); dedup_semantic's verify gained the AQE-starvation
    # repartition and knn_classify the corpus _spread (item 7 census fixes)
    assert set(Q._CHANGED_R10) == {
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_clusters_star",
        "dedup_cluster_census",
        "minhash_candidate_pr_audit",
        "dedup_threshold_sweep",
        "dedup_cluster_source_span",
        "corpus_clean_pipeline",
        "dedup_ngram_containment",
        "dedup_winnowed_spans",
        "dedup_semantic",
        "knn_classify_embeddings",
    }


def test_every_front_entry_is_oracle_checked():
    # a fronted entry without an oracle would burn a sample slot on a
    # rows-only check; the whole round-10 front carries SQL
    for name in (
        list(Q._REVERIFY_R10)
        + list(Q._ROUND10_NEW)
        + list(Q._CHANGED_R10)
        + list(Q._STALE_R10)
    ):
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # steady-state rounds keep new+changed bounded so >= 39 sample
    # slots land on oldest-green re-verifications; round 10's changed
    # lane is exactly the verdict-prescribed jaccard family (8) plus
    # the census-param entries and the two census fixes
    n_front = (
        len(Q._REVERIFY_R10) + len(Q._ROUND10_NEW) + len(Q._CHANGED_R10)
    )
    assert n_front <= 12, (
        f"{n_front} new/changed entries would crowd the stale "
        "re-verification batch out of the driver's ~50-row budget"
    )


def test_round9_provenance_retained():
    # the round-9 lanes stay importable as the backlog's provenance
    # (CORRECTNESS_r09.json was sampled from exactly this front)
    assert Q._STALE_R9 == Q._STALE_R8[41:]
    assert len(Q._STALE_R9) == 33
    assert len(Q._FRONT_R9) == 50
