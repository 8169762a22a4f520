"""Fixture-schema pin (VERDICT r2 item #6).

The round-2 driver regeneration silently flipped events.ts from
TIMESTAMP(NANOS) to timestamp[us] and 79 tests failed in a cascade. This
test pins every fixture table's Arrow schema to a committed manifest
(tests/fixture_schemas.json) so the NEXT drift produces one failing test
naming the exact table+column.

If this test fails after a driver regeneration: diff the reported columns,
make the affected reader dtype-adaptive (sources/catalog.py::table is the
model), then refresh the manifest.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from spark_cherry_shuffle_service_spark.sources.catalog import TABLES

MANIFEST = os.path.join(os.path.dirname(__file__), "fixture_schemas.json")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fixture_schemas_match_manifest(sf_dir):
    with open(MANIFEST) as fh:
        want = json.load(fh)
    drift: list[str] = []
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            drift.append(f"{t}: file missing at {sf_dir}")
            continue
        got = {f.name: str(f.type) for f in pq.read_schema(path)}
        if got != want[t]:
            gone = {c: ty for c, ty in want[t].items() if got.get(c) != ty}
            new = {c: ty for c, ty in got.items() if want[t].get(c) != ty}
            drift.append(f"{t}: expected {gone} but file has {new}")
    assert not drift, (
        "fixture schema drift (driver regenerated testdata?) — make the "
        f"reader dtype-adaptive, then refresh {MANIFEST}: {drift}"
    )


def test_manifest_covers_all_tables():
    with open(MANIFEST) as fh:
        want = json.load(fh)
    assert set(want) == set(TABLES)
