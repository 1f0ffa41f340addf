"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the standing contract (reverify lane
first, then new, then changed, then the oldest-green backlog /
oldest-green fill) so a stray re-registration can't silently push an
unverified entry out of the driver's sampling window.  Round-12 lanes
are the current front; the round-7..11 lists remain in
queries/_registry.py as the backlog's provenance."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def _front():
    return (
        list(Q._REVERIFY_R12)
        + list(Q._ROUND12_NEW)
        + list(Q._CHANGED_R12)
        + list(Q._STALE_R12)
    )


def test_front_lanes_lead_the_registry_in_order():
    front = _front()
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_round12_front_is_exactly_the_sample_budget():
    # 2 changed + 32 round-7-green + 16 round-8-green = 50: one driver
    # sample retires the round-7 backlog entirely, and the oldest
    # driver green anywhere advances to round 8 (round-11 verdict
    # item 3)
    front = _front()
    assert len(front) == 50
    assert len(Q._STALE_R12) == 48


def test_changed_lane_is_the_orientation_seam():
    # round-11 verdict item 2: triangle census + clustering
    # coefficient gained the orientation parameter with the "auto"
    # max-degree gate (the heavy-tail seam executed on the hub stress
    # graph -- SCALE.md round-12 wave).  The registered co-event calls
    # resolve to the same id-oriented plan plus the 1-row gate
    # aggregate, values identical, fronted under the "code changed =>
    # green history stale" standard.
    assert set(Q._CHANGED_R12) == {
        "triangle_count_users",
        "clustering_coefficient_users",
    }


def test_every_front_entry_is_oracle_checked():
    # a fronted entry without an oracle would burn a sample slot on a
    # rows-only check; the whole round-12 front carries SQL
    for name in _front():
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # steady-state rounds keep new+changed bounded so >= 39 sample
    # slots land on oldest-green re-verifications; round 12's changed
    # lane is exactly the two orientation-seam graph entries
    n_front = (
        len(Q._REVERIFY_R12) + len(Q._ROUND12_NEW) + len(Q._CHANGED_R12)
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


def test_round11_provenance_retained():
    # CORRECTNESS_r11.json was sampled from exactly this front (the
    # judge re-verified the byte-exact key order against _FRONT_R11)
    assert len(Q._FRONT_R11) == 50
    assert len(Q._STALE_R11) == 38
    assert len(Q._CHANGED_R11) == 12
