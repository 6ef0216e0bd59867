"""Unit tests for bench.py's regression guard (no Spark needed).

Round-2 postmortem: the guard read ``json.load(fh)["queries"]`` but the
driver-committed BENCH_r*.json files nest the printed JSON under
``"parsed"`` — so the prior map was always empty and the guard never
fired, letting two phantom 3x regressions sail through. These tests pin
both the parse (driver-nested AND direct formats) and that the
comparator demonstrably fires on an injected slowdown.
"""

from __future__ import annotations

import json

import bench


def test_load_prior_driver_nested_format(tmp_path):
    """Driver files: timings under parsed.queries, not top-level."""
    p = tmp_path / "BENCH_r02.json"
    p.write_text(
        json.dumps(
            {
                "n": 1,
                "rc": 0,
                "cpus": 32,
                "sf": 0.1,
                "tail": "",
                "parsed": {
                    "metric": "total_bench_seconds",
                    "value": 3.0,
                    "unit": "sec",
                    "queries": {"wordcount": 0.3, "monster_query": 1.35},
                    "sf": 0.1,
                },
            }
        )
    )
    assert bench.load_prior_queries(str(p)) == {
        "wordcount": 0.3,
        "monster_query": 1.35,
    }


def test_load_prior_direct_format(tmp_path):
    """Locally-printed files: queries at top level."""
    p = tmp_path / "BENCH_local.json"
    p.write_text(json.dumps({"queries": {"q1": 1.0}, "sf": 0.1}))
    assert bench.load_prior_queries(str(p)) == {"q1": 1.0}


def test_load_prior_tolerates_garbage(tmp_path):
    p = tmp_path / "BENCH_bad.json"
    p.write_text("not json {{{")
    assert bench.load_prior_queries(str(p)) == {}
    assert bench.load_prior_queries(str(tmp_path / "missing.json")) == {}
    null_parsed = tmp_path / "BENCH_null.json"
    null_parsed.write_text(json.dumps({"parsed": None, "n": 1}))
    assert bench.load_prior_queries(str(null_parsed)) == {}


def test_guard_fires_on_injected_slowdown():
    prior = {"monster_query": 1.35, "wordcount": 0.3}
    timings = {"monster_query": 4.79, "wordcount": 0.31}
    regs = bench.find_regressions(prior, timings)
    assert regs == {"monster_query": [1.35, 4.79]}


def test_guard_ignores_subsecond_jitter_and_new_queries():
    prior = {"wordcount": 0.3}
    # 2x ratio but only 0.3s absolute -> jitter, not a regression;
    # brand-new query with no prior -> not a regression.
    timings = {"wordcount": 0.6, "brand_new": 10.0}
    assert bench.find_regressions(prior, timings) == {}


def test_guard_end_to_end_against_committed_r02():
    """The exact scenario the broken guard missed: parse the real
    committed BENCH_r02.json and check a 3x slowdown would now fire."""
    prior = bench.load_prior_queries("/root/repo/BENCH_r02.json")
    assert prior, "committed BENCH_r02.json must parse to a non-empty map"
    name, before = next(iter(prior.items()))
    regs = bench.find_regressions(prior, {name: before * 3 + 1.0})
    assert name in regs
