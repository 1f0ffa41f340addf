"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the standing contract (reverify lane
first, then new, then changed, then the oldest-green backlog, then
the oldest-green fill) so a stray re-registration can't silently push
an unverified entry out of the driver's sampling window.  Round-9
lanes are the current front; the round-7/8 lists remain in
queries/_registry.py as the backlog's provenance."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def test_front_lanes_lead_the_registry_in_order():
    front = (
        list(Q._REVERIFY_R9)
        + list(Q._ROUND9_NEW)
        + list(Q._CHANGED_R9)
        + list(Q._STALE_R9)
        + list(Q._NEXT_OLDEST_R9)
    )
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_stale_backlog_is_r8_minus_the_41_sampled():
    # CORRECTNESS_r08.json re-greened the first 41 of the round-8
    # stale lane (after its 9 front rows); the backlog must be exactly
    # the rest, in the same oldest-green-first order -- these are the
    # last entries anywhere whose driver green is round <= 4
    assert Q._STALE_R9 == Q._STALE_R8[41:]
    assert len(Q._STALE_R9) == 33


def test_round9_front_is_exactly_the_sample_budget():
    # 4 changed + 33 stale + 13 fill = 50: one driver sample retires
    # the <=round-4 backlog entirely (round-8 verdict item 1)
    front = (
        list(Q._REVERIFY_R9)
        + list(Q._ROUND9_NEW)
        + list(Q._CHANGED_R9)
        + list(Q._STALE_R9)
        + list(Q._NEXT_OLDEST_R9)
    )
    assert len(front) == 50


def test_every_new_and_changed_entry_is_oracle_checked():
    # a new/changed entry without an oracle would burn a front slot on
    # a rows-only check; every lane-2/3 entry must carry SQL.  The
    # round-9 fill lane is asserted oracle-bearing too (all 44 of the
    # round-5-green cohort carry oracles).
    for name in (
        list(Q._REVERIFY_R9)
        + list(Q._ROUND9_NEW)
        + list(Q._CHANGED_R9)
        + list(Q._NEXT_OLDEST_R9)
    ):
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # the round-8 verdict caps round 9's new+changed at 5 so >= 45
    # sample slots land on re-verifications; keep the cap pinned
    n_front = (
        len(Q._REVERIFY_R9) + len(Q._ROUND9_NEW) + len(Q._CHANGED_R9)
    )
    assert n_front <= 5, (
        f"{n_front} new/changed entries would crowd the stale "
        "re-verification batch out of the driver's ~50-row budget"
    )
