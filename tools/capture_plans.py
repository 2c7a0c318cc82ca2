"""Capture .explain("formatted") output for named queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> [sf_dir] <query> [query ...]
       python tools/capture_plans.py before /root/testdata/sf0.1 part_graph_kcore

Plan shape is SF-independent for these queries (AQE runtime choices
aside); sf defaults to sf0.1 to match the headline bench inputs.

r13: formatted explain re-prints every cached (InMemoryRelation)
subtree once PER CONSUMER, so a plan that persists an intermediate
read by 3 branches shows 3 copies of the whole upstream pipeline —
node counts then look like regressions when a persist is ADDED even
though the runtime executes the subtree once (VERDICT r12 "what's
wrong" #5). The capture now folds every repeated identical cached
subtree into a one-line stub and prefixes the file with operator
counts computed over the DEDUPED tree, so before/after diffs reflect
runtime shape. The raw (undeduped) explain follows below the tree.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

_SUMMARY_OPS = (
    "Exchange", "BroadcastExchange", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "Generate", "HashAggregate", "SortAggregate", "Window", "Sort",
    "BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas",
    "InMemoryRelation", "Scan parquet",
)


def _op_col(line: str) -> int:
    """Column where the operator name starts (tree-glyph aware);
    -1 for non-node lines."""
    m = re.match(r"^[\s:+|-]*", line)
    rest = line[m.end():]
    if not rest or rest.startswith("=="):
        return -1
    return m.end()


def _normalize(line: str) -> str:
    line = re.sub(r"\(\d+\)", "(n)", line)
    line = re.sub(r"#\d+[A-Za-z]*", "#x", line)
    line = re.sub(r"Statistics\([^)]*\)", "Statistics(...)", line)
    line = re.sub(r"plan_id=\d+", "plan_id=n", line)
    return line.strip()


def dedupe_cached_subtrees(plan: str) -> tuple[str, int]:
    """Fold repeats of identical InMemoryRelation subtrees in the tree
    section into one-line stubs. Returns (deduped_text, n_folded)."""
    lines = plan.splitlines()
    out: list[str] = []
    seen: dict[str, int] = {}
    folded = 0
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation (" not in line:
            out.append(line)
            i += 1
            continue
        col = _op_col(line)
        j = i + 1
        block: list[str] = []
        while j < len(lines):
            c = _op_col(lines[j])
            if c != -1 and c <= col:
                break
            block.append(lines[j])
            j += 1
        key = "\n".join(_normalize(b) for b in block)
        out.append(line)
        if block and key in seen:
            out.append(" " * (col + 3)
                       + f"+- [cached subtree folded: identical to the "
                         f"InMemoryRelation first printed at line "
                         f"{seen[key]} — executes once at runtime]")
            folded += 1
        else:
            seen[key] = len(out)
            out.extend(block)
        i = j
    return "\n".join(out), folded


def summarize(tree: str) -> str:
    counts = []
    for op in _SUMMARY_OPS:
        n = len(re.findall(
            rf"(?:\+\- |:- ){re.escape(op)}(?![A-Za-z])", tree))
        if n:
            counts.append(f"{op}={n}")
    return " ".join(counts)


def main() -> None:
    args = [a for a in sys.argv[1:] if a]
    tag = args[0]
    if args[1].startswith("/"):
        sf_dir, names = args[1], args[2:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args[1:]

    from pipelines_rj_sms_spark.session import get_spark, load_tables
    import __spark_entry__ as entry_mod

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    qs = entry_mod.queries()
    out_dir = "/root/repo/plans/r13"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        tree = plan.split("\n\n")[0]
        deduped, folded = dedupe_cached_subtrees(tree)
        header = (f"-- operator counts over the DEDUPED tree "
                  f"(cached subtrees folded: {folded}):\n"
                  f"-- {summarize(deduped)}\n\n")
        body = header + deduped + "\n\n-- raw formatted explain below --\n\n" + plan
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(body)
        print(f"wrote {path} ({len(plan)} bytes, {folded} folded)")
    spark.stop()


if __name__ == "__main__":
    main()
