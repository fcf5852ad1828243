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


def test_rotation_staleness_stays_bounded():
    """The driver checks the first ~50 of queries() per round. Invariant:
    every query whose latest driver row predates the previous round sits
    INSIDE the window — except when a round registers so many NEW queries
    that overdue > 50, which no ordering can fix. In that overflow case
    the guard is (a) the overflow is exactly the mathematical minimum,
    and (b) only previously-green (checked-before) queries are bumped —
    a never-checked query must never wait an extra round."""
    e = _entry()
    last = e._last_checked()
    if not last:
        return  # fresh clone without artifacts: nothing to bound
    current_round = max(last.values()) + 1
    names = list(e.queries())
    head = set(names[:50])
    overdue = [n for n in names if last.get(n, 0) < current_round - 1]
    missed = [n for n in overdue if n not in head]
    assert len(missed) <= max(0, len(overdue) - 50), (
        f"{len(missed)} overdue queries outside the 50-query driver window "
        f"(minimum possible {max(0, len(overdue) - 50)}): {missed[:10]}"
    )
    for n in missed:
        assert n in last, f"never-checked query {n} bumped out of the window"
