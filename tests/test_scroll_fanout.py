"""S6 sliced scan, S7 scroll scan, and the nested-entity fan-out (§2.12).

Fetchers are fakes standing in for pymongo/elasticsearch clients (absent
in this container); they run on executors via cloudpickle, exactly like
an injected real client would.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from pipelines_rj_sms_spark.operators.fanout import Entity, fan_out
from pipelines_rj_sms_spark.quality.checks import reconcile_counts
from pipelines_rj_sms_spark.sources.scroll import (plan_slices,
                                                   plan_slices_by_cap,
                                                   scroll_scan, sliced_scan)

# a fake 57-document collection keyed 0..56. Fetchers must close over
# the data (pickled by value) — a module-level function would be pickled
# by reference and executors can't import the test module.
_COLLECTION = [{"_id": i, "v": i * 10} for i in range(57)]


def _make_find():
    coll = list(_COLLECTION)
    return lambda lo, hi: [d for d in coll if lo <= d["_id"] <= hi]


def test_plan_slices_covers_range_inclusive(spark):
    rows = plan_slices(spark, 0, 56, 25).collect()
    assert [(r.slice_id, r.lo, r.hi) for r in rows] == [
        (0, 0, 24), (1, 25, 49), (2, 50, 56)]
    with pytest.raises(ValueError):
        plan_slices(spark, 5, 4, 10)


def test_sliced_scan_fetches_every_doc_once(spark):
    slices = plan_slices(spark, 0, 56, 25)
    docs = sliced_scan(slices, _make_find())
    got = sorted(json.loads(r.doc)["_id"] for r in docs.collect())
    assert got == list(range(57))
    # Q1 count reconcile against the source count, the reference's gate
    assert reconcile_counts(57, docs).passed


def test_plan_slices_by_cap_metabase_shape(spark):
    # 57 rows, cap 20 -> 3 slices over keys 0..56
    rows = plan_slices_by_cap(spark, 0, 56, total=57, cap=20).collect()
    assert len(rows) == 3
    assert rows[0].lo == 0 and rows[-1].hi == 56


def test_sliced_scan_truncation_guard(spark):
    # every slice returns exactly `cap` docs — indistinguishable from a
    # truncated response, so the scan must fail loudly (S20/Q4 posture)
    slices = plan_slices(spark, 0, 9, 5)
    capped = lambda lo, hi: [{"_id": i} for i in range(3)]  # noqa: E731
    with pytest.raises(Exception, match="truncated"):
        sliced_scan(slices, capped, cap=3).collect()
    # under the cap: fine
    assert sliced_scan(slices, capped, cap=4).count() == 6


def test_sliced_scan_retries_then_raises(spark):
    def flaky(lo, hi):
        raise ConnectionError("shard down")

    slices = plan_slices(spark, 0, 9, 10)
    with pytest.raises(Exception, match="after 3 tries"):
        sliced_scan(slices, flaky).collect()


def _make_scroll():
    """Fake sliced-scroll: docs hash-routed to slices, 10-doc pages."""
    coll = list(_COLLECTION)

    def scroll(slice_id, num_slices, cursor):
        mine = [d for d in coll if d["_id"] % num_slices == slice_id]
        start = int(cursor) if cursor else 0
        page = mine[start:start + 10]
        nxt = str(start + 10) if start + 10 < len(mine) else None
        return page, nxt

    return scroll


def test_scroll_scan_drains_every_slice(spark):
    docs = scroll_scan(spark, 3, _make_scroll())
    rows = docs.collect()
    assert sorted(json.loads(r.doc)["_id"] for r in rows) == list(range(57))
    # each doc arrived via its hash-routed slice
    assert all(json.loads(r.doc)["_id"] % 3 == r.slice_id for r in rows)


def test_scroll_scan_bounds_runaway_cursor(spark):
    def never_ends(slice_id, num_slices, cursor):
        return [{"x": 1}], "again"

    with pytest.raises(Exception, match="still open"):
        scroll_scan(spark, 1, never_ends, max_pages=5).collect()


# ---------------------------------------------------------------- fan-out

_LAB_SCHEMA = StructType([
    StructField("sol_id", StringType()),
    StructField("cpf", StringType()),
    StructField("exames", ArrayType(StructType([
        StructField("exame_id", StringType()),
        StructField("nome", StringType()),
        StructField("resultados", ArrayType(StructType([
            StructField("analito", StringType()),
            StructField("valor", DoubleType()),
        ]))),
    ]))),
])

_LAB_SPEC = Entity(
    "solicitacao", key_fields=("sol_id",),
    children=(("exames", Entity(
        "exame", key_fields=("exame_id",),
        children=(("resultados", Entity("resultado")),))),))


def _lab_payloads(spark):
    payloads = [
        json.dumps({"sol_id": "S1", "cpf": "111", "exames": [
            {"exame_id": "E1", "nome": "hemograma", "resultados": [
                {"analito": "hb", "valor": 13.5},
                {"analito": "ht", "valor": 40.1}]},
            {"exame_id": "E2", "nome": "glicose", "resultados": [
                {"analito": "glu", "valor": 99.0}]}]}),
        json.dumps({"sol_id": "S2", "cpf": "222", "exames": []}),
    ]
    return spark.createDataFrame([(p,) for p in payloads], ["payload"])


def test_fan_out_three_linked_tables(spark):
    tables = fan_out(_lab_payloads(spark), "payload", _LAB_SCHEMA, _LAB_SPEC)
    assert set(tables) == {"solicitacao", "exame", "resultado"}

    sol = {r.sol_id: r.cpf for r in tables["solicitacao"].collect()}
    assert sol == {"S1": "111", "S2": "222"}

    ex = sorted((r.solicitacao_sol_id, r.exame_id, r.nome)
                for r in tables["exame"].collect())
    assert ex == [("S1", "E1", "hemograma"), ("S1", "E2", "glicose")]

    res = sorted((r.solicitacao_sol_id, r.exame_exame_id, r.analito, r.valor)
                 for r in tables["resultado"].collect())
    assert res == [("S1", "E1", "hb", 13.5), ("S1", "E1", "ht", 40.1),
                   ("S1", "E2", "glu", 99.0)]


def test_fan_out_outer_keeps_childless_parents(spark):
    tables = fan_out(_lab_payloads(spark), "payload", _LAB_SCHEMA, _LAB_SPEC,
                     keep_empty_parents=True)
    rows = tables["exame"].collect()
    assert {r.solicitacao_sol_id for r in rows} == {"S1", "S2"}
    assert [r.exame_id for r in rows if r.solicitacao_sol_id == "S2"] == [None]
    assert tables["exame"].filter(F.col("exame_id").isNull()).count() == 1


def test_fan_out_stays_jvm_side(spark):
    tables = fan_out(_lab_payloads(spark), "payload", _LAB_SCHEMA, _LAB_SPEC)
    for df in tables.values():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- crawl

def _make_graph_fetcher():
    graph = {
        "ed1": ("edition one index", ["a1", "a2"]),
        "ed2": ("edition two index", ["a2", "a3"]),
        "a1": ("article one", []),
        "a2": ("article two", ["a1"]),        # back-link: must not refetch
        "a3": ("article three", ["missing"]),
    }

    def fetch(url):
        if url not in graph:
            raise KeyError(url)
        return graph[url]

    return fetch


def test_crawl_scan_bfs_visits_once(spark):
    from pipelines_rj_sms_spark.sources.crawl import crawl_scan

    out = crawl_scan(spark, ["ed1", "ed2"], _make_graph_fetcher(),
                     max_depth=2).collect()
    by_url = {r.url: r for r in out}
    # every page exactly once, at its first-seen depth
    assert len(out) == len(by_url) == 6
    assert by_url["ed1"].depth == 0 and by_url["a2"].depth == 1
    assert by_url["a1"].depth == 1     # via ed1, not refetched via a2
    assert by_url["a3"].content == "article three"
    # unfetchable page recorded, not dropped
    assert by_url["missing"].content.startswith("__error__")


def test_crawl_scan_depth_bound(spark):
    from pipelines_rj_sms_spark.sources.crawl import crawl_scan

    out = crawl_scan(spark, ["ed1"], _make_graph_fetcher(),
                     max_depth=0).collect()
    assert [r.url for r in out] == ["ed1"]
