"""Z-order clustering: Morton key correctness and the data-skipping
property it exists for — point queries on ANY z-column prune files."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.operators.zorder import (
    cluster_zorder,
    zorder_key,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_zorder_key_interleaves_extremes(spark):
    # a 16x16 grid: uniform quantiles make bucket == value; the Morton
    # key of the corners is known exactly
    rows = [(float(a), float(b)) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {(r["x"], r["y"]): r["k"] for r in df.withColumn(
        "k", zorder_key(df, ["x", "y"], bits_per_col=4)).collect()}
    assert out[(0.0, 0.0)] == 0
    assert out[(15.0, 15.0)] == 255
    # x contributes the higher bit of each pair: (15,0) -> 0b10101010
    assert out[(15.0, 0.0)] == 0b10101010
    assert out[(0.0, 15.0)] == 0b01010101
    # Morton locality: neighbors in the grid are near in key space for
    # the quadrant structure (same top-level quadrant shares both MSBs)
    assert all(0 <= v <= 255 for v in out.values())


def test_zorder_rejects_strings(spark):
    df = spark.createDataFrame([("a", 1.0)], ["s", "x"])
    with pytest.raises(TypeError, match="unsupported type"):
        zorder_key(df, ["s", "x"])


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_zorder_skips_files_on_both_columns(spark, tmp_path):
    """vs linear sort on user_id: z-order trades a little pruning on
    the leading column for pruning on BOTH columns; total files hit
    over point probes on either column must drop."""
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    ev = read_parquet_normalized(
        spark, os.path.join(SF_DIR, "events.parquet")
    ).select("user_id", "value")
    n_files = 16

    lin_dir = str(tmp_path / "linear")
    (ev.repartitionByRange(n_files, "user_id")
       .sortWithinPartitions("user_id").write.parquet(lin_dir))
    z_dir = str(tmp_path / "zorder")
    cluster_zorder(ev, ["user_id", "value"], n_files).write.parquet(z_dir)

    def ranges(d, col):
        out = []
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    probes = {
        "user_id": [r[0] for r in ev.select("user_id").distinct().collect()],
        "value": ev.stat.approxQuantile(
            "value", [i / 10 for i in range(1, 10)], 0.001),
    }

    def avg_hits(d, col):
        rs = ranges(d, col)
        ps = probes[col]
        return sum(sum(1 for lo, hi in rs if lo <= p <= hi) for p in ps) \
            / len(ps)

    # range partitioning can merge sparse ranges: normalize by the
    # actual non-empty file counts, not the requested 16
    lin_files = len(ranges(lin_dir, "user_id"))
    z_files = len(ranges(z_dir, "user_id"))
    assert lin_files >= 8 and z_files >= 8

    lin_user, lin_val = avg_hits(lin_dir, "user_id"), avg_hits(lin_dir, "value")
    z_user, z_val = avg_hits(z_dir, "user_id"), avg_hits(z_dir, "value")

    # linear layout: value predicates can prune ~nothing
    assert lin_val > 0.85 * lin_files
    # z-order: both columns prune meaningfully...
    assert z_val <= 0.6 * z_files
    assert z_user <= 0.8 * z_files
    # ...and the either-column average strictly improves
    assert (z_user + z_val) / 2 < (lin_user + lin_val) / 2 * (z_files / lin_files)


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason="driver testdata not present")
def test_compact_partitions_zorder_path(spark, tmp_path):
    """compact_partitions(zorder=True) rewrites fragmented files into a
    Morton-clustered layout and preserves every row."""
    from pipelines_rj_sms_spark.session import read_parquet_normalized
    from pipelines_rj_sms_spark.sinks.lakehouse import compact_partitions

    ev = read_parquet_normalized(
        spark, os.path.join(SF_DIR, "events.parquet")
    ).select("event_id", "user_id", "value")
    path = str(tmp_path / "tbl")
    # fragment: 40 tiny files
    ev.repartition(40).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 30

    rewritten = compact_partitions(
        spark, path, target_file_bytes=1 << 20,
        sort_cols=["user_id", "value"], zorder=True)
    assert rewritten == 1  # the one (unpartitioned) table unit
    after = spark.read.parquet(path)
    assert after.count() == ev.count()
    assert set(after.columns) == set(ev.columns)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after < n_before
