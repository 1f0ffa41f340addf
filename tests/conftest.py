from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nearscan_kafka_streams_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="nearscan-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Drain the _persist_tracked registry after EVERY test.

    A tracked handle that outlives its test is a delayed cache bomb:
    if a later fixture persists the SAME canonicalized plan, Spark
    keeps ONE CacheManager entry, the fixture's persist() is a no-op
    on the leftover's entry, and whichever test next calls
    release_cached() destroys the fixture's cache from under it --
    the cross-module flake behind
    test_consumers_leave_staged_cache_alive (passed in module
    isolation, failed its fixture-arrives-cached precondition in the
    full suite).  _persist_tracked's decline-foreign-ownership check
    prevents NEW adoptions of an existing entry but cannot retire
    handles tracked BEFORE that entry existed; draining per-test
    guarantees _CACHED never crosses a test boundary."""
    yield
    from nearscan_kafka_streams_spark.functions.dedup import release_cached

    release_cached()
