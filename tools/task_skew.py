"""Per-stage task-duration skew readout via the Spark status REST API.

The scale question the stress harness asks is not "did it finish" but
"did one straggler task do all the work" — the signature of a hot key
defeating the operator's skew discipline. The UI status store already
tracks per-task durations; this reads each completed stage's
[median, max] duration summary and reports the max/median ratio.

Local-mode only needs the session's own UI (http://localhost:4040 by
default); on a cluster point it at the driver UI. Returns [] when the
UI is disabled rather than failing — callers must skip, not pass.
"""

from __future__ import annotations

import json
import urllib.request


def stage_skew_report(spark, min_stage_ms: int = 1000,
                      min_tasks: int = 4) -> list[dict]:
    """[{stage_id, name, n_tasks, med_ms, max_ms, ratio}] for every
    COMPLETE stage whose max task duration >= ``min_stage_ms`` and
    task count >= ``min_tasks`` (1-task stages and sub-second stages
    are all JVM/scheduler noise — a 3 ms median against a 40 ms max
    is not skew). ratio = max/median; median 0 counts as 1 ms."""
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return []
    app = sc.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    try:
        stages = json.load(urllib.request.urlopen(url, timeout=30))
    except Exception:
        return []
    out = []
    for s in stages:
        if s.get("numCompleteTasks", 0) < min_tasks:
            continue
        sid, att = s["stageId"], s["attemptId"]
        try:
            ts = json.load(urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages/{sid}/{att}"
                f"/taskSummary?quantiles=0.5,1.0", timeout=30))
        except Exception:
            continue
        dur = ts.get("duration")
        if not dur or len(dur) < 2:
            continue
        med, mx = float(dur[0]), float(dur[1])
        if mx < min_stage_ms:
            continue
        out.append({
            "stage_id": sid,
            "name": s.get("name", "")[:60],
            "n_tasks": s["numCompleteTasks"],
            "med_ms": med,
            "max_ms": mx,
            "ratio": round(mx / max(med, 1.0), 2),
        })
    return out
