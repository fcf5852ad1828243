"""Driver-contract rotation: least-recently-driver-checked queries first.

Pure-Python (no SparkSession) — validates the __spark_entry__ ordering
logic against the CORRECTNESS_r*.json artifacts actually on disk.
"""

from __future__ import annotations

import importlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _entry():
    return importlib.import_module("__spark_entry__")


def test_queries_cover_registry_exactly():
    e = _entry()
    from crossai_ts_spark.entry_queries import REGISTRY

    names = list(e.queries())
    assert set(names) == set(REGISTRY)
    assert len(names) == len(REGISTRY)  # no duplicates
    assert set(e.oracle_sql()) <= set(names)


def test_rotation_orders_stalest_first():
    e = _entry()
    last = e._last_checked()
    names = list(e.queries())
    rounds = [last.get(n, 0) for n in names]
    assert rounds == sorted(rounds), "queries() must ascend by last-checked round"
    # anything the driver has never checked must lead the list
    never = {n for n in names if n not in last}
    if never:
        head = set(names[: len(never)])
        assert head == never


def test_rotation_survives_missing_artifacts(tmp_path, monkeypatch):
    """With no CORRECTNESS files readable, ordering degrades to registry
    order instead of raising."""
    e = _entry()
    monkeypatch.setattr(
        e, "_last_checked", lambda: {}, raising=True
    )
    from crossai_ts_spark.entry_queries import REGISTRY

    assert list(e.queries()) == list(REGISTRY)
