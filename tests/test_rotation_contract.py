"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the standing contract (reverify lane
first, then new, then changed, then the oldest-green backlog /
oldest-green fill) so a stray re-registration can't silently push an
unverified entry out of the driver's sampling window.  Round-11 lanes
are the current front; the round-7/8/9/10 lists remain in
queries/_registry.py as the backlog's provenance."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def test_front_lanes_lead_the_registry_in_order():
    front = (
        list(Q._REVERIFY_R11)
        + list(Q._ROUND11_NEW)
        + list(Q._CHANGED_R11)
        + list(Q._STALE_R11)
    )
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_round11_front_is_exactly_the_sample_budget():
    # 12 changed + 32 round-6-green + 6 round-7-green = 50: one driver
    # sample retires the round-6 backlog entirely, and the oldest
    # driver-green anywhere advances to round 7 (round-10 verdict
    # item 4; the triangle/cc re-plan later the same round takes the
    # last two round-7-head slots)
    front = (
        list(Q._REVERIFY_R11)
        + list(Q._ROUND11_NEW)
        + list(Q._CHANGED_R11)
        + list(Q._STALE_R11)
    )
    assert len(front) == 50
    assert len(Q._STALE_R11) == 38


def test_changed_lane_is_spans_spread_plus_jaccard_gate():
    # round-10 verdict item 1: duplicate_spans gains _spread (plan
    # changed, values identical) -> dedup_substring_spans; item 2:
    # jaccard auto gains the dense-vocab short-circuit, re-planning
    # the registered producer, its six staged-edge consumers and
    # corpus_clean_pipeline; round-10 ADVICE: containment's k>=2
    # prefix persist gated on materialize -> dedup_ngram_containment
    # (identical executed plan for the registered call, fronted under
    # the "code changed => green history stale" standard); round-11
    # addition: triangle census + clustering coefficient re-planned
    # from the wedge double self-join to adjacency intersection
    # (outputs identical, SCALE.md round-11 wave)
    assert set(Q._CHANGED_R11) == {
        "dedup_substring_spans",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_clusters_star",
        "dedup_cluster_census",
        "minhash_candidate_pr_audit",
        "dedup_threshold_sweep",
        "dedup_cluster_source_span",
        "corpus_clean_pipeline",
        "dedup_ngram_containment",
        "triangle_count_users",
        "clustering_coefficient_users",
    }


def test_every_front_entry_is_oracle_checked():
    # a fronted entry without an oracle would burn a sample slot on a
    # rows-only check; the whole round-11 front carries SQL
    for name in (
        list(Q._REVERIFY_R11)
        + list(Q._ROUND11_NEW)
        + list(Q._CHANGED_R11)
        + list(Q._STALE_R11)
    ):
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # steady-state rounds keep new+changed bounded so >= 39 sample
    # slots land on oldest-green re-verifications; round 11's changed
    # lane is exactly the verdict-prescribed spans + jaccard-gate
    # families (9) plus the containment materialize-gate entry
    n_front = (
        len(Q._REVERIFY_R11) + len(Q._ROUND11_NEW) + len(Q._CHANGED_R11)
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


def test_round10_provenance_retained():
    # CORRECTNESS_r10.json was sampled from exactly this front
    assert len(Q._FRONT_R10) == 50
    assert len(Q._STALE_R10) == 38
    assert len(Q._CHANGED_R10) == 12
