"""Property-based tests (SURVEY §5.2 item 4): idempotence and determinism
invariants of the conform/dedup layer, driver-side (no Spark needed for
the pure functions — fast hypothesis iteration)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pipelines_rj_sms_spark.functions.cleaning import (
    clean_column_name,
    dedupe_column_names,
)
from pipelines_rj_sms_spark.functions.dates import relative_date
from pipelines_rj_sms_spark.functions.keys import operator_key


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_clean_column_name_idempotent(name):
    once = clean_column_name(name)
    assert clean_column_name(once) == once  # fixpoint
    assert once  # never empty
    # output alphabet is the safe set and never starts with a digit
    assert all(c.islower() or c.isdigit() or c == "_" for c in once)
    assert not once[0].isdigit()


@given(st.lists(st.text(alphabet="ab_1", min_size=1, max_size=6), max_size=20))
@settings(max_examples=200, deadline=None)
def test_dedupe_column_names_unique_and_stable(names):
    out = dedupe_column_names(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out)  # all unique
    # first occurrence of each name is preserved verbatim
    seen = set()
    for orig, new in zip(names, out):
        if orig not in seen:
            assert new == orig
            seen.add(orig)


@given(st.dictionaries(st.text(alphabet="abcdef", min_size=1, max_size=8),
                       st.text(alphabet="xyz123", max_size=8), max_size=8))
@settings(max_examples=200, deadline=None)
def test_operator_key_order_independent(kwargs):
    items = list(kwargs.items())
    a = operator_key(**dict(items))
    b = operator_key(**dict(reversed(items)))
    assert a == b  # sorted join -> argument order never matters


@given(st.integers(min_value=0, max_value=3650),
       st.dates(min_value=__import__("datetime").date(2000, 1, 2),
                max_value=__import__("datetime").date(2030, 12, 31)))
@settings(max_examples=200, deadline=None)
def test_relative_date_day_algebra(n, today):
    import datetime

    got = relative_date(f"D-{n}", today)
    assert (today - got).days == n
    assert relative_date("yesterday", today) == today - datetime.timedelta(days=1)
    m = relative_date(f"M-{n % 24}", today)
    assert m.day == 1  # month algebra truncates to period start


# ---- randomized equivalence: connected components vs pure union-find ----

def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node id in the set
    comp = {}
    for n in nodes:
        root = find(n)
        comp.setdefault(root, []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def test_connected_components_random_graphs_match_union_find(spark):
    import random

    from pipelines_rj_sms_spark.operators.dedup import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        nodes = list(range(n))
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        edges = [(a, b) for a, b in edges if a != b]
        expect = _uf_components(edges, nodes)

        edf = spark.createDataFrame(edges or [(0, 0)], ["id_a", "id_b"])
        ndf = spark.createDataFrame([(x,) for x in nodes], ["node_id"])
        got = {r["node"]: r["component"] for r in
               connected_components(edf, nodes=ndf, node_col="node_id").collect()}
        assert got == expect, f"trial {trial}"


def test_winnow_recall_random_shared_substrings(spark):
    """Randomized recall check: inject a shared substring of length
    k+w-1 into otherwise-random documents — winnowing must always
    produce at least one shared fingerprint."""
    import random
    import string

    from pyspark.sql import functions as F

    from pipelines_rj_sms_spark.functions.text import winnow_fingerprints

    rng = random.Random(7)
    k, w = 8, 4

    def rand_text(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    rows = []
    for i in range(20):
        shared = rand_text(k + w - 1)
        rows.append((2 * i, rand_text(30) + shared + rand_text(30)))
        rows.append((2 * i + 1, rand_text(25) + shared + rand_text(35)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = df.select("doc_id",
                    winnow_fingerprints("text", k=k, w=w).alias("fps"))
    got = {r["doc_id"]: set(r["fps"]) for r in fps.collect()}
    for i in range(20):
        assert got[2 * i] & got[2 * i + 1], f"pair {i} missed"
