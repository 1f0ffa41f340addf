"""Rotation-contract lint: the driver hash-samples the FIRST ~50
QUERIES entries each round, so dict order IS the verification
schedule.  These tests pin the round-7 contract (reverify lane first,
then new, then changed, then the oldest-green backlog) so a stray
re-registration can't silently push an unverified entry out of the
driver's sampling window."""

from __future__ import annotations

from nearscan_kafka_streams_spark import queries as Q


def test_front_lanes_lead_the_registry_in_order():
    front = (
        list(Q._REVERIFY_R7)
        + list(Q._ROUND7_NEW)
        + list(Q._CHANGED_R7)
        + list(Q._STALE_R7)
    )
    keys = list(Q.QUERIES)
    assert keys[: len(front)] == front


def test_reverify_lane_outranks_everything():
    # round-6 verdict item #1: the failed-then-fixed entry must be the
    # FIRST thing the driver touches
    assert next(iter(Q.QUERIES)) == "sessionize_events"


def test_every_new_and_changed_entry_is_oracle_checked():
    # a new/changed entry without an oracle would burn a front slot on
    # a rows-only check; every lane-2/3 entry must carry SQL
    for name in list(Q._ROUND7_NEW) + list(Q._CHANGED_R7):
        assert name in Q.ORACLES, f"{name} fronted without an oracle"


def test_driver_budget_arithmetic_documented():
    # lanes 1-3 must leave room inside a 50-row sample for at least a
    # handful of stale re-verifications; if a future wave pushes past
    # this, rotate part of it to the next round instead
    n_front = (
        len(Q._REVERIFY_R7) + len(Q._ROUND7_NEW) + len(Q._CHANGED_R7)
    )
    assert n_front <= 45, (
        f"{n_front} new/changed entries would crowd stale "
        "re-verification out of the driver's ~50-row budget"
    )
