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
