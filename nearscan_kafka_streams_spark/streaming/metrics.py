"""Streaming metrics export: the ops surface a live operator watches.

Reference parity: per-task JMX -> Prometheus export
(pom.xml:320-325; extras/java-agent/streams-config.yml).  Spark
equivalent: a ``StreamingQueryListener`` capturing every
``StreamingQueryProgress`` -- input/processed rates, batch duration,
state-store rows, watermark, and any ``DataFrame.observe`` metrics
(e.g. the transfer flat-map's overflow counters) -- into memory and
optionally a JSONL file a scraper can tail.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Collects progress rows; attach with ``spark.streams.addListener``.

    ``rows()`` returns parsed progress dicts; ``metric(name)`` pulls a
    named observed-metrics row from the latest batches that carry it.
    """

    def __init__(self, jsonl_path: str | None = None):
        self._rows: list[dict] = []
        self._lock = threading.Lock()
        self._path = jsonl_path

    # -- listener callbacks (called from a background thread)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        row = json.loads(event.progress.json)
        with self._lock:
            self._rows.append(row)
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    # -- accessors

    def rows(self) -> list[dict]:
        with self._lock:
            return list(self._rows)

    def total_input_rows(self) -> int:
        return sum(int(r.get("numInputRows", 0)) for r in self.rows())

    def state_rows_total(self) -> int:
        """numRowsTotal across state operators of the LATEST progress
        that has any (streaming aggregation/join/dedup state size)."""
        for r in reversed(self.rows()):
            ops = r.get("stateOperators") or []
            if ops:
                return sum(int(o.get("numRowsTotal", 0)) for o in ops)
        return 0

    def metric(self, name: str) -> dict | None:
        """Latest observed-metrics row registered under ``name``
        (DataFrame.observe) across captured batches."""
        for r in reversed(self.rows()):
            om = r.get("observedMetrics") or {}
            if name in om:
                return om[name]
        return None
