"""Full declared-query sweep vs the DuckDB oracle at sf0.001.

This is the driver's t2 correctness gate run in-process: EVERY entry in
__spark_entry__.queries() must match its oracle_sql() on row count,
column names, and sorted values. The driver samples a subset per round;
this test keeps the whole surface green so sampling can't catch a
regressed query. Marked slow — it is the longest single test in the
suite (~2-4 min at sf0.001).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from verify_oracle import run_sweep  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.001")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_all_declared_queries_match_oracle(spark):
    n_pass, n_fail, n_rows_only, failures = run_sweep(
        spark, SF_DIR, verbose=False)
    assert n_fail == 0, "oracle mismatches:\n" + "\n".join(failures)
    # every declared query ran; the rows-only set is the known,
    # intentional non-SQL-expressible remainder
    assert n_pass >= 90
    # rows-only by design (see no_oracle_reasons()): zlib compression,
    # PCA's data-dependent training. BPE left this set in r10 — its
    # merge loop replays as a DuckDB recursive CTE.
    assert n_rows_only <= 2
