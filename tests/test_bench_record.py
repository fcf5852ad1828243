"""bench.py record contract — no Spark needed: build_records/compact_line
are pure functions over measured numbers.

Guards (r6): the per-tier breakdown (BASELINE.json metric contract) can't
be silently dropped by a cascade refactor, and the <1500-char compact
line survives every shrink path including failures-only overflow.
"""

from __future__ import annotations

import json

import pytest

from bench import build_records, compact_line


def fake_rollup(n_tiers: int = 3) -> dict:
    return {
        "n_docs": 2000,
        "n_tokens": 8_000_000,
        "wall_sec": 0.5,
        "tokens_per_sec": 16_000_000.0,
        "tier_detail": {
            k: {"rows": 1000 // k, "sec": 0.1 * k, "tokens_per_sec": 1e6 / k}
            for k in range(1, n_tiers + 1)
        },
    }


def test_per_tier_breakdown_complete():
    out, full = build_records(fake_rollup(), {"q1": 1.0}, {"q1": [1.0]}, 0.1)
    assert sorted(out["rollup"]["per_tier"]) == ["1", "2", "3"]
    assert out["n_failed"] == 0 and out["failed"] == []
    assert full["query_trials"] == {"q1": [1.0]}


def test_per_tier_breakdown_missing_tier_asserts():
    r = fake_rollup()
    del r["tier_detail"][3]
    with pytest.raises(AssertionError, match="per-tier breakdown incomplete"):
        build_records(r, {}, {}, 0.1)


def test_loadavg_recorded_in_full_artifact():
    loads = {"q1": [[0.5, 0.6, 1.5, 0.9]]}
    _, full = build_records(fake_rollup(), {"q1": 1.0}, {"q1": [1.0]}, 0.1, q_loads=loads)
    assert full["query_loadavg"] == loads


def test_compact_line_fits_and_keeps_failures():
    # 120 queries with long names overflow 1500 chars; failures must survive
    q = {f"query_with_a_rather_long_name_{i:03d}": float(i) for i in range(120)}
    q["broken_query_a"] = -1.0
    q["broken_query_b"] = -1.0
    trials = {k: [v] for k, v in q.items()}
    out, _ = build_records(fake_rollup(), q, trials, 0.1)
    line = compact_line(out)
    rec = json.loads(line)
    assert len(line) < 1500
    assert rec["n_failed"] == 2
    assert rec["queries"]["broken_query_a"] == -1.0
    assert rec["queries"]["broken_query_b"] == -1.0


def test_compact_line_failures_only_overflow_truncates_not_asserts():
    # ADVICE r5: if failures ALONE keep the line >= 1500 chars, the list is
    # truncated (n_failed stays authoritative) instead of asserting away a
    # bench whose measurements completed
    q = {f"very_long_failed_query_name_padding_padding_{i:04d}": -1.0 for i in range(60)}
    trials = {k: [-1.0] for k in q}
    out, _ = build_records(fake_rollup(), q, trials, 0.1)
    line = compact_line(out)
    rec = json.loads(line)
    assert len(line) < 1500
    assert rec["n_failed"] == 60  # authoritative count intact
    assert len(rec["failed"]) < 60  # list truncated to fit
