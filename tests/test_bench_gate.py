"""bench.py --full family regression gate: passes same-era noise,
trips genuine family blowups, and is immune to suite-composition
changes (no Spark needed — pure arithmetic over the recorded
FULLBENCH_r*.json baselines)."""

import importlib.util
import json
import os

REPO = os.path.join(os.path.dirname(__file__), "..")


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _newest_queries():
    import glob
    paths = sorted(glob.glob(os.path.join(REPO, "FULLBENCH_r*.json")))
    return json.load(open(paths[-1]))["queries"], os.path.basename(
        paths[-1])


def test_gate_passes_identical_run():
    b = _bench()
    timings, _ = _newest_queries()
    reg, delta = b._family_regressions(dict(timings))
    assert reg == {}
    assert delta["removed_vs_baseline"] == []
    assert delta["added_vs_baseline"] == []


def test_gate_trips_genuine_family_blowup():
    b = _bench()
    timings, src = _newest_queries()
    # blow up the largest family by 1.5x, query by query
    fams = {}
    for name, sec in timings.items():
        fams.setdefault(b._family(name), []).append(name)
    fam = max(fams, key=lambda f: sum(timings[n] for n in fams[f]))
    worse = {n: (sec * 1.5 if b._family(n) == fam else sec)
             for n, sec in timings.items()}
    flagged, _ = b._family_regressions(worse)
    assert fam in flagged
    assert flagged[fam]["baseline"] == src
    assert flagged[fam]["drift_pct"] >= 45


def test_gate_immune_to_new_queries_in_family():
    """Adding NEW (legitimately expensive) queries to a family must
    not fire the gate: drift is computed over the intersection of
    query names, so composition changes are invisible."""
    b = _bench()
    timings, _ = _newest_queries()
    cur = dict(timings)
    cur["dedup_brand_new_expensive_query"] = 99.0
    reg, delta = b._family_regressions(cur)
    assert "dedup" not in reg
    # ...but the composition change is VISIBLE in the artifact
    assert "dedup_brand_new_expensive_query" in delta["added_vs_baseline"]


def test_gate_ignores_subsecond_families():
    b = _bench()
    import glob
    if not glob.glob(os.path.join(REPO, "FULLBENCH_r*.json")):
        return
    # a query set disjoint from the baseline shares nothing -> no gate
    reg, delta = b._family_regressions({"nonexistent_query_zz": 9.9})
    assert reg == {}
    # renames can't trip the gate, but they can't hide either
    assert len(delta["removed_vs_baseline"]) > 0


def test_headline_baseline_loads_newest_headbench():
    """The 3x contention-rescue reference: newest HEADBENCH_r*.json
    per-query timings, with the source file recorded for the bench
    artifact."""
    b = _bench()
    base = b._headline_baseline()
    assert base, "no HEADBENCH baseline found"
    assert b._headline_baseline.last_file.startswith("HEADBENCH_r")
    # every headline query benched last round has a positive timing
    assert all(isinstance(v, (int, float)) and v > 0
               for v in base.values())
    # the flagship is always in the headline set
    assert "flagship_pricing_summary" in base
