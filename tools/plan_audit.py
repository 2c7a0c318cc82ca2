"""Generate PLANS.md: an executed-plan audit of the bench headline
queries — exchanges, join strategies, pushed filters, codegen, Python
boundaries — so the scale claims in SCALE.md can be checked against the
real plans in one read.

Counts are CUMULATIVE across every SQL execution the query triggers
(read from the session's SQLAppStatusStore), not just the final
DataFrame's plan — iterative operators (k-core peel rounds, LPA,
pagerank, connected components) run many jobs whose exchanges a
final-plan read hides behind localCheckpoint (VERDICT r6 #5 / r7 #4);
eager per-operator collects (global_cumsum offsets) are included the
same way. The `execs` column shows how many SQL executions ran.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plans,
not data, are the subject; plan shape is SF-independent here)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def audit(plan: str) -> dict[str, object]:
    # an executed AdaptiveSparkPlan prints final plan THEN the initial
    # plan — audit only the final one
    plan = plan.split("== Initial Plan ==")[0]
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)
    join_counts: dict[str, int] = {}
    for j in joins:
        join_counts[j] = join_counts.get(j, 0) + 1
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "joins": join_counts,
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "arrow_python": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas"),
        "row_python": plan.count("BatchEvalPython"),
        "takeordered": "TakeOrderedAndProject" in plan,
    }


_JOIN_NAMES = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct")


def audit_formatted(desc: str) -> dict[str, object]:
    """Audit a SQL-UI physicalPlanDescription (EXPLAIN FORMATTED
    layout: numbered tree + per-node detail blocks). Only nodes in the
    FINAL plan tree count — the initial-plan tree shares detail ids
    for common nodes but owns its own for pre-AQE exchanges/joins."""
    m = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", desc, re.S)
    tree = m.group(1) if m else desc.split("\n\n", 1)[0]
    final_ids = set(re.findall(r"\((\d+)\)", tree))
    blocks: dict[str, tuple[str, str]] = {}
    for bm in re.finditer(
            r"^\((\d+)\) (\w+)([^\n]*)((?:\n(?!\(\d+\) ).*)*)",
            desc, re.M):
        blocks.setdefault(bm.group(1),
                          (bm.group(2), bm.group(3) + bm.group(4)))
    exchanges = 0
    joins: dict[str, int] = {}
    pushed = 0
    codegen_ids = set()
    arrow = row_py = 0
    for nid in final_ids:
        if nid not in blocks:
            continue
        name, body = blocks[nid]
        if name == "Exchange" and ("hashpartitioning" in body
                                   or "rangepartitioning" in body):
            # rangepartitioning: the repartitionByRange passes from
            # operators/ids.py (global_cumsum & co.) are real shuffles
            # and must show in the shuffle column
            exchanges += 1
        if name in _JOIN_NAMES:
            joins[name] = joins.get(name, 0) + 1
        for pf in re.findall(r"PushedFilters: \[([^\]]*)\]", body):
            if pf.strip():
                pushed += 1
                break
        cg = re.search(r"\[codegen id : (\d+)\]", body)
        if cg:
            codegen_ids.add((nid, cg.group(1)))
        if name in ("MapInPandas", "ArrowEvalPython",
                    "FlatMapGroupsInPandas", "FlatMapGroupsInPandasWithState"):
            arrow += 1
        if name == "BatchEvalPython":
            row_py += 1
    return {
        "exchanges": exchanges,
        "joins": joins,
        "pushed_filters": pushed,
        "codegen_spans": len({c for _, c in codegen_ids}),
        "arrow_python": arrow,
        "row_python": row_py,
        "takeordered": "TakeOrderedAndProject" in tree,
    }


def _executions(spark):
    """All SQL executions in the session's status store, as
    {execution_id: physical_plan_description}."""
    store = spark._jsparkSession.sharedState().statusStore()
    seq = store.executionsList()
    out = {}
    for i in range(seq.size()):
        e = seq.apply(i)
        out[e.executionId()] = e.physicalPlanDescription()
    return out


def _merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if isinstance(v, bool):
            out[k] = out.get(k, False) or v
        elif isinstance(v, dict):
            m = dict(out.get(k, {}))
            for j, c in v.items():
                m[j] = m.get(j, 0) + c
            out[k] = m
        else:
            out[k] = out.get(k, 0) + v
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from bench import HEADLINE
    from pipelines_rj_sms_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # register the table views up front so the first query's row does
    # not absorb the 10 one-time CreateViewCommand executions
    from pipelines_rj_sms_spark.session import load_tables
    load_tables(spark, sf_dir)

    lines = [
        "# PLANS — executed-plan audit of the bench headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. Columns:",
        "execs (SQL executions the query triggered — iterative",
        "operators and eager per-operator collects show their true",
        "count; the first row also absorbs the 10 one-time view",
        "registrations), shuffles (hash- AND range-partitioning",
        "exchanges — the repartitionByRange passes of the ids.py",
        "prefix-sum helpers are real shuffle work,",
        "summed over all executions), join strategies, scans with",
        "non-empty `PushedFilters`, whole-stage-codegen spans,",
        "Arrow-batched Python operators (the sanctioned slow path),",
        "and row-at-a-time Python (must always be 0). AQE stage reuse",
        "can repeat a node under distinct ids, so counts are upper",
        "bounds on distinct operators.",
        "",
        "| query | execs | shuffles | joins | pushed scans | codegen "
        "| arrow-py | row-py |",
        "|---|---|---|---|---|---|---|---|",
    ]
    full = "--full" in sys.argv
    names = sorted(qs) if full else list(HEADLINE)
    from pipelines_rj_sms_spark.operators.cache import release, release_all
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    persist_leaks: list[str] = []
    for name in names:
        print(f"auditing {name}", flush=True)
        before = set(_executions(spark))
        df = qs[name](spark, sf_dir)
        # collect() executes THIS DataFrame's own QueryExecution under
        # a new SQL execution id — it lands in the status store AND
        # finalizes AQE (isFinalPlan=false hides join/codegen choices)
        df.collect()
        # Persist-ledger guard (VERDICT r9 #7): every query result must
        # carry its FULL release chain — release(df) alone has to empty
        # the cache. A block left behind means an operator persisted
        # without track() (or a post-track transform orphaned the
        # chain, the operators/ids.py:144 bug class). release_all()
        # then recovers via the session registry so one leak doesn't
        # poison every later row, but the query is still flagged and
        # the audit exits non-zero.
        release(df)
        if not cache_mgr.isEmpty():
            recovered = release_all()
            spark.catalog.clearCache()      # truly untracked blocks
            persist_leaks.append(
                f"{name} (registry recovered {recovered})")
        # cumulative audit over every SQL execution the query ran —
        # construction-time collects and per-iteration jobs included
        a: dict = {}
        n_execs = 0
        for eid, desc in _executions(spark).items():
            if eid in before:
                continue
            n_execs += 1
            a = _merge(a, audit_formatted(desc))
        if not a:  # defensive: no executions recorded
            a = audit(df._jdf.queryExecution().executedPlan().toString())
            n_execs = 1
        joins = ", ".join(f"{k.replace('Join', '')}×{v}"
                          for k, v in sorted(a["joins"].items())) or "—"
        topk = " +TakeOrdered" if a["takeordered"] else ""
        lines.append(
            f"| {name} | {n_execs} | {a['exchanges']} | {joins}{topk} "
            f"| {a['pushed_filters']} | {a['codegen_spans']} "
            f"| {a['arrow_python']} | {a['row_python']} |")
    out = "/root/repo/PLANS_FULL.md" if full else "/root/repo/PLANS.md"
    if full:
        lines[0] = ("# PLANS_FULL — executed-plan audit of EVERY "
                    "declared query")
    if persist_leaks:
        lines += ["", "## PERSIST LEAKS (release(df) left cached blocks)",
                  ""] + [f"- {x}" for x in persist_leaks]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(names)} queries)")
    spark.stop()
    if persist_leaks:
        print("PERSIST LEAKS:", ", ".join(persist_leaks))
        sys.exit(4)


if __name__ == "__main__":
    main()
