"""bench.py --full family regression gate: passes same-era noise,
trips genuine family blowups (no Spark needed — pure arithmetic over
the recorded FULLBENCH_r*.json baselines)."""

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


def _newest_families():
    import glob
    paths = sorted(glob.glob(os.path.join(REPO, "FULLBENCH_r*.json")))
    return json.load(open(paths[-1]))["families"], os.path.basename(
        paths[-1])


def test_gate_passes_identical_run():
    b = _bench()
    fams, _ = _newest_families()
    assert b._family_regressions({k: dict(v) for k, v in fams.items()}) \
        == {}


def test_gate_trips_genuine_family_blowup():
    b = _bench()
    fams, src = _newest_families()
    worse = {k: dict(v) for k, v in fams.items()}
    # pick the largest family by total seconds and blow it up 1.5x
    fam = max(worse, key=lambda k: worse[k]["sec"])
    worse[fam]["sec"] = round(worse[fam]["sec"] * 1.5, 3)
    flagged = b._family_regressions(worse)
    assert fam in flagged
    assert flagged[fam]["baseline"] == src
    assert flagged[fam]["drift_pct"] >= 45


def test_gate_ignores_subsecond_families():
    b = _bench()
    fams = {"tiny": {"sec": 0.4, "n": 2, "max_query": "x", "max_sec": 0.3}}
    # even a 10x blowup of a sub-2s family is JVM noise, not signal
    cur = {"tiny": {"sec": 4.0, "n": 2, "max_query": "x", "max_sec": 3.0}}
    import glob
    if not glob.glob(os.path.join(REPO, "FULLBENCH_r*.json")):
        return
    # the recorded baselines have no "tiny" family; absent families and
    # sub-threshold totals are skipped without error
    assert b._family_regressions(cur) == {} or "tiny" not in \
        b._family_regressions(cur)
