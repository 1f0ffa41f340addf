"""The bench stdout contract: the driver tail-reads ~2 KB of stdout,
splits on newlines, and ``json.loads`` the FINAL line.  Rounds 2-4 lost
their bench numbers because the final line embedded ~90 per-query
timings (~3.3 KB) and overflowed that window -- this test simulates the
driver's exact parse against a worst-case-sized suite so the line can
never regress past the window again."""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, final_line  # noqa: E402


def _driver_tail_parse(stdout: str) -> dict:
    """What the round driver does: keep the last 2000 bytes, take the
    final non-empty line, json.loads it."""
    tail = stdout.encode()[-2000:].decode(errors="replace")
    lines = [ln for ln in tail.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_final_line_fits_driver_tail_window():
    # worst case: every headline query timed, long names, plus a pile of
    # errors and noisy preceding stdout (Spark WARN spew)
    timings = {name: 123.456 for name in HEADLINE}
    timings.update({f"extra_query_with_a_long_name_{i:03d}": 9.99 for i in range(40)})
    errors = {f"err_query_{i}": "SomeException: boom" for i in range(20)}

    line = final_line(timings, errors, 0.1)
    assert len(line.encode()) < 500, f"final line is {len(line)} bytes"

    noise = "\n".join(f"26/08/14 12:00:{i:02d} WARN Executor: spill {i}" for i in range(60))
    stdout = noise + "\n" + line + "\n"

    parsed = _driver_tail_parse(stdout)
    assert parsed["metric"] == "headline-suite wall time"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(timings)
    assert parsed["error_count"] == len(errors)
    assert isinstance(parsed["value"], float)
    # the per-query dict must NOT be on the line -- it lives in the side file
    assert "queries" not in parsed
    assert "stress_10x_ratio" not in parsed


def test_final_line_zero_queries_still_parses():
    parsed = json.loads(final_line({}, {}, "0.01"))
    assert parsed["value"] == 0 and parsed["n_queries"] == 0


def test_final_line_floor_skips_surface_only_when_nonzero():
    # a budget-starved floor pass must be visible on the driver line;
    # the normal (zero-skip) line stays byte-identical to before
    assert "floor_skips" not in json.loads(final_line({}, {}, 0.1))
    parsed = json.loads(final_line({}, {}, 0.1, floor_skips=3))
    assert parsed["floor_skips"] == 3
    # worst case still fits the driver's tail window
    timings = {f"extra_query_with_a_long_name_{i:03d}": 9.99 for i in range(135)}
    errors = {f"err_query_{i}": "SomeException: boom" for i in range(20)}
    line = final_line(timings, errors, 0.1, floor_skips=12)
    assert len(line.encode()) < 500


def test_every_headline_entry_is_registered():
    from nearscan_kafka_streams_spark.queries import QUERIES

    missing = [n for n in HEADLINE if n not in QUERIES]
    assert not missing, missing


def test_every_registry_family_has_a_headline_member():
    """The HEADLINE selection rule (bench.py module docstring) excludes
    cheap siblings, never whole families: each FAMILY_PATTERNS family
    must keep at least one timed representative, so adding a new
    capability family without benching it fails this lint."""
    from collections import defaultdict

    from bench import family_of
    from nearscan_kafka_streams_spark.queries import QUERIES

    members = defaultdict(list)
    for name in QUERIES:
        members[family_of(name)].append(name)
    timed = set(HEADLINE)
    unbenched = {
        fam: ms
        for fam, ms in members.items()
        if not any(m in timed for m in ms)
    }
    assert not unbenched, unbenched


def test_staged_edge_consumers_directly_follow_producer():
    """The staged Jaccard edge frame must stay alive only across the
    family (clearCache is suppressed while it is staged), so the three
    consumers must sit immediately after dedup_ngram_jaccard."""
    i = HEADLINE.index("dedup_ngram_jaccard")
    assert HEADLINE[i + 1 : i + 4] == [
        "dedup_clusters",
        "dedup_clusters_star",
        "dedup_cluster_census",
    ]
