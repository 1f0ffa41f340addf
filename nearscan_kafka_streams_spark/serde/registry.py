"""Confluent Schema Registry client (startup schema fetch).

The reference wires a Schema Registry URL into every serde and fetches
value schemas at startup (util/Schemas.java:113-136; registration in
pom.xml:199-244).  Parity here: a minimal REST client for the public
Confluent SR API (GET /subjects/{s}/versions/latest, GET
/schemas/ids/{id}) used once at plan-build time -- never per record --
plus a dict-backed stand-in for air-gapped runs and tests.
"""

from __future__ import annotations

import json
import urllib.request


class SchemaRegistryClient:
    """Minimal Confluent SR REST client (read-only, startup-time)."""

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _get(self, path: str) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            headers={"Accept": "application/vnd.schemaregistry.v1+json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_json) of the subject's latest version."""
        doc = self._get(f"/subjects/{subject}/versions/latest")
        return int(doc["id"]), doc["schema"]

    def by_id(self, schema_id: int) -> str:
        return self._get(f"/schemas/ids/{schema_id}")["schema"]


class StaticSchemaRegistry:
    """In-code registry: subject -> (schema_id, schema_json).

    The deployment mode this engine defaults to (schemas declared in
    code, schemas.py); same interface as the REST client so sources can
    take either.
    """

    def __init__(self, subjects: dict[str, tuple[int, str]]):
        self._subjects = dict(subjects)
        self._by_id = {sid: sch for sid, sch in subjects.values()}

    def latest(self, subject: str) -> tuple[int, str]:
        return self._subjects[subject]

    def by_id(self, schema_id: int) -> str:
        return self._by_id[schema_id]
