"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the standing contract (reverify lane
first, then new, then changed, then the oldest-green backlog) so a
stray re-registration can't silently push an unverified entry out of
the driver's sampling window.  Round-8 lanes are the current front;
the round-7 lists remain in queries.py as the backlog's provenance."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def test_front_lanes_lead_the_registry_in_order():
    front = (
        list(Q._REVERIFY_R8)
        + list(Q._ROUND8_NEW)
        + list(Q._CHANGED_R8)
        + list(Q._STALE_R8)
    )
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_stale_backlog_is_r7_minus_the_13_sampled():
    # CORRECTNESS_r07.json rows 38-50 re-greened the first 13 of the
    # round-7 stale lane; the backlog must be exactly the rest, in the
    # same oldest-green-first order
    assert Q._STALE_R8 == Q._STALE_R7[13:]
    assert len(Q._STALE_R8) == 74


def test_every_new_and_changed_entry_is_oracle_checked():
    # a new/changed entry without an oracle would burn a front slot on
    # a rows-only check; every lane-2/3 entry must carry SQL
    for name in (
        list(Q._REVERIFY_R8) + list(Q._ROUND8_NEW) + list(Q._CHANGED_R8)
    ):
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # lanes 1-3 must leave room inside a 50-row sample for a large
    # stale re-verification batch this round (the 74-entry backlog is
    # the round-7 verdict's one freshness gap); if a future wave
    # pushes past this, rotate part of it to the next round instead
    n_front = (
        len(Q._REVERIFY_R8) + len(Q._ROUND8_NEW) + len(Q._CHANGED_R8)
    )
    assert n_front <= 10, (
        f"{n_front} new/changed entries would crowd the round-8 "
        "stale re-verification batch out of the driver's ~50-row budget"
    )
