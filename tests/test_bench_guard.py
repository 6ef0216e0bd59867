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


def test_newest_prior_file_sorts_by_round_number():
    files = ["BENCH_r02.json", "BENCH_r100.json", "BENCH_r99.json", "notes.txt"]
    # lexicographic sorted()[-1] would pick r99; the integer sort must not
    assert bench.newest_prior_file(files) == "BENCH_r100.json"
    assert bench.newest_prior_file(["README.md"]) is None
    assert bench.newest_prior_file([]) is None


def test_load_anchor_parses_marked_table(tmp_path):
    p = tmp_path / "BASELINE.md"
    p.write_text(
        "# BASELINE\n\nprose | with | pipes\n\n"
        "<!-- anchors:begin -->\n"
        "| query | seconds |\n"
        "|---|---|\n"
        "| wordcount | 0.33 |\n"
        "| monster_query | 1.84 |\n"
        "<!-- anchors:end -->\n\n"
        "| trailing | 9.9 |\n"  # outside markers: ignored
    )
    assert bench.load_anchor(str(p)) == {"wordcount": 0.33, "monster_query": 1.84}


def test_load_anchor_missing_file_or_markers(tmp_path):
    assert bench.load_anchor(str(tmp_path / "nope.md")) == {}
    p = tmp_path / "BASELINE.md"
    p.write_text("# no markers\n| wordcount | 0.33 |\n")
    assert bench.load_anchor(str(p)) == {}


def test_committed_baseline_anchors_cover_bench_set():
    """The committed BASELINE.md anchor table must parse and cover every
    bench query, so the guard always compares against the steady-state
    anchor rather than a noisy one-shot driver file."""
    anchors = bench.load_anchor(bench.ANCHOR_PATH)
    assert anchors, "BASELINE.md must carry a parseable anchor table"
    missing = set(bench.BENCH_QUERIES) - set(anchors)
    assert not missing, f"anchor table missing bench queries: {missing}"


def test_adjudicate_confirms_and_clears_flags():
    """A flag whose isolated re-run is fast again is phantom; one whose
    re-run is still slow is confirmed — the r3 judge adjudication, now
    done by the harness itself."""
    flagged = {"phantom_q": [1.0, 3.0], "real_q": [1.0, 3.0]}
    reruns = {"phantom_q": 0.9, "real_q": 2.9}
    out = bench.adjudicate(flagged, lambda n: reruns[n])
    assert out["phantom_q"]["confirmed"] is False
    assert out["real_q"]["confirmed"] is True
    assert out["phantom_q"]["rerun"] == 0.9
    assert out["phantom_q"]["prior"] == 1.0
    assert out["phantom_q"]["recorded"] == 3.0


def test_adjudicate_rerun_must_clear_both_thresholds():
    # rerun 1.2s is >1.3x? no (1.2 < 1.3) -> phantom even though recorded 3x
    out = bench.adjudicate({"q": [1.0, 3.0]}, lambda n: 1.2, ratio=1.3)
    assert out["q"]["confirmed"] is False
    # rerun 1.7s: ratio yes (1.7 > 1.3) and absolute delta 0.7 > 0.5 -> confirmed
    out = bench.adjudicate({"q": [1.0, 3.0]}, lambda n: 1.7, ratio=1.3)
    assert out["q"]["confirmed"] is True
    # at the host-calibrated default (2.0x) the same 1.7s rerun is phantom
    out = bench.adjudicate({"q": [1.0, 3.0]}, lambda n: 1.7)
    assert out["q"]["confirmed"] is False


def test_find_watch_covers_the_blind_spot():
    """The r4 case: dedup_minhash_lsh at 1.79x anchor was under the
    2.0x regression bar and nothing adjudicated it. The watch tier
    must catch 1.5-2.0x, exclude <1.5x and sub-second jitter, and
    exclude anything already flagged as a regression."""
    prior = {"minhash": 1.188, "fast": 1.0, "small": 0.1, "reg": 1.0}
    timings = {"minhash": 2.123, "fast": 1.3, "small": 0.19, "reg": 3.0}
    flagged = bench.find_regressions(prior, timings)
    assert flagged == {"reg": [1.0, 3.0]}
    watch = bench.find_watch(prior, timings, flagged)
    # minhash: 1.79x and +0.94s -> watched; fast: 1.3x -> below bar;
    # small: 1.9x but +0.09s absolute -> jitter; reg: regression path
    assert watch == {"minhash": [1.188, 2.123]}


def test_watch_adjudication_uses_watch_ratio():
    """Watch flags re-run against the 1.5x bar, not the 2.0x one."""
    watched = {"drift": [1.0, 1.8], "noise": [1.0, 1.8]}
    reruns = {"drift": 1.7, "noise": 1.1}
    out = bench.adjudicate(watched, lambda n: reruns[n], ratio=bench.WATCH_RATIO)
    assert out["drift"]["confirmed"] is True  # 1.7 > 1.5x and +0.7s
    assert out["noise"]["confirmed"] is False


def test_demote_phantoms_routes_watch_band_drift():
    """A >2.0x flag whose isolated re-run lands in the 1.5-2.0x band
    must move from phantom_flags to watch as drift-confirmed — the
    one path where real 1.5-2.0x drift could previously vanish into
    "cleared" (find_watch excludes anything in flagged; ADVICE r5).
    Re-runs below the watch bar (or sub-second) stay phantom."""
    phantom = {
        "drift": {"prior": 1.0, "recorded": 2.6, "rerun": 1.8, "confirmed": False},
        "noise": {"prior": 1.0, "recorded": 2.6, "rerun": 1.2, "confirmed": False},
        "small": {"prior": 0.1, "recorded": 0.9, "rerun": 0.19, "confirmed": False},
    }
    watch: dict = {}
    bench.demote_phantoms_to_watch(phantom, watch)
    assert set(phantom) == {"noise", "small"}
    assert set(watch) == {"drift"}
    assert watch["drift"]["confirmed"] is True
    assert watch["drift"]["rerun"] == 1.8


def test_find_superlinear_flags_only_beyond_slack():
    scaling = {
        "linear": {"small_s": 1.0, "large_s": 10.0, "data_ratio": 10.0, "time_ratio": 10.0},
        "sublinear": {"small_s": 1.0, "large_s": 4.0, "data_ratio": 10.0, "time_ratio": 4.0},
        "quadratic": {"small_s": 1.0, "large_s": 100.0, "data_ratio": 10.0, "time_ratio": 100.0},
    }
    out = bench.find_superlinear(scaling)
    assert set(out) == {"quadratic"}


def test_adjudicate_superlinear_clears_and_confirms():
    """A probe whose large-point re-run is linear again was a
    contention burst (cleared, rerun recorded); one still super-linear
    is confirmed. The r5 case: 10M teragen 33.7s in-sequence, 5.6s
    isolated."""
    scaling = {
        "burst": {"small_s": 0.8, "large_s": 33.7, "data_ratio": 10.0, "time_ratio": 42.1},
        "quad": {"small_s": 1.0, "large_s": 100.0, "data_ratio": 10.0, "time_ratio": 100.0},
        "fine": {"small_s": 1.0, "large_s": 6.0, "data_ratio": 10.0, "time_ratio": 6.0},
    }
    reruns = {"burst": 5.6, "quad": 98.0}
    out = bench.adjudicate_superlinear(scaling, lambda n: reruns[n])
    assert set(out) == {"quad"}
    assert scaling["burst"]["large_rerun_s"] == 5.6
    assert scaling["burst"]["time_ratio"] == 7.0  # min(33.7, 5.6)/0.8
    assert scaling["quad"]["time_ratio"] == 98.0
    assert "large_rerun_s" not in scaling["fine"]  # unflagged: no re-run


def test_guard_end_to_end_against_committed_r02():
    """The exact scenario the broken guard missed: parse the real
    committed BENCH_r02.json and check a 3x slowdown would now fire."""
    prior = bench.load_prior_queries("/root/repo/BENCH_r02.json")
    assert prior, "committed BENCH_r02.json must parse to a non-empty map"
    name, before = next(iter(prior.items()))
    regs = bench.find_regressions(prior, {name: before * 3 + 1.0})
    assert name in regs


def test_guard_flags_injected_slowdown_against_committed_anchors():
    """r18 VERDICT #1 'done' criterion for the re-anchor: with the
    COMMITTED anchor table, a deliberately injected slowdown in a
    canary query must flag — 1.55x lands in the watch tier (above
    WATCH_RATIO, under the 2.0x regression bar), 2.1x lands in the
    regression tier; both clear the 0.5s absolute floor because the
    canary is the largest anchor in the table."""
    anchors = bench.load_anchor(bench.ANCHOR_PATH)
    assert anchors
    canary = max(anchors, key=anchors.get)
    base = anchors[canary]
    assert base > 1.0, f"canary anchor too small for the 0.5s floor: {canary}"
    timings = dict(anchors)

    timings[canary] = round(base * 1.55, 3)
    assert bench.find_regressions(anchors, timings) == {}
    watch = bench.find_watch(anchors, timings, flagged={})
    assert canary in watch

    timings[canary] = round(base * 2.1, 3)
    regs = bench.find_regressions(anchors, timings)
    assert canary in regs
    # and a clean set of timings flags nothing at all
    assert bench.find_regressions(anchors, dict(anchors)) == {}
    assert bench.find_watch(anchors, dict(anchors), flagged={}) == {}
