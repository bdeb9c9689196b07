"""Layout sinks: clustering gives disjoint per-file key ranges (the
data-skipping contract) and compaction controls file counts."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.sinks import write_clustered, write_compacted


def _files(path):
    return sorted(glob.glob(f"{path}/*.parquet"))


def test_write_clustered_ranges_disjoint(spark, tmp_path):
    out = str(tmp_path / "clustered")
    df = spark.range(0, 10000).select(
        (F.xxhash64("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    write_clustered(df, out, ["k"], n_files=4)
    files = _files(out)
    assert len(files) == 4
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # every file covers its own key range; ranges don't interleave
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # nothing lost
    back = spark.read.parquet(out)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(10000))


def test_write_compacted_file_count_and_roundtrip(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # simulate small-file ingest: 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    assert len(_files(src)) == 40
    df = spark.read.parquet(src)
    n = write_compacted(df, out, target_mb=512)
    assert n == 1  # tiny input collapses to one file
    assert len(_files(out)) == 1
    assert spark.read.parquet(out).count() == 4000


def test_write_compacted_partitioned(spark, tmp_path):
    out = str(tmp_path / "part_out")
    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    write_compacted(df, out, partition_by=["p"])
    parts = sorted(glob.glob(f"{out}/p=*"))
    assert [p.rsplit("=", 1)[1] for p in parts] == ["0", "1", "2"]
    # one writer per hive partition, not one per (task, partition)
    for p in parts:
        assert len(glob.glob(f"{p}/*.parquet")) == 1
    back = spark.read.parquet(out)
    assert back.groupBy("p").count().count() == 3
    assert back.count() == 300


def _file_ranges(path, col_idx):
    ranges = []
    for f in _files(path):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(col_idx)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_write_zordered_tight_boxes_on_both_dims(spark, tmp_path):
    from dbt_incremental_ci_spark.sinks.layout import write_zordered

    lin = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    # two independent uniform dims: linear clustering on x leaves y
    # ranges at full width; z-order must shrink them
    df = spark.range(0, 40000).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
    )
    write_clustered(df, lin, ["x"], n_files=16)
    write_zordered(df, zo, ["x", "y"], n_files=16)

    def mean_span(path, idx):
        rs = _file_ranges(path, idx)
        return sum(hi - lo for lo, hi in rs) / len(rs)

    full = 2000.0  # hash % 1000 spans (-999, 999)
    # linear: y unclustered -> spans ~ full width
    assert mean_span(lin, 1) > 0.8 * full
    # z-order: both dims well under half the full span per file
    assert mean_span(zo, 0) < 0.5 * full
    assert mean_span(zo, 1) < 0.5 * full
    # roundtrip: nothing lost, no helper column leaks
    back = spark.read.parquet(zo)
    assert back.columns == ["x", "y"]
    assert back.count() == 40000


def test_zorder_key_deterministic_and_bounded(spark):
    from dbt_incremental_ci_spark.sinks.layout import zorder_key

    df = spark.range(0, 100).select(
        F.col("id").alias("x"), (99 - F.col("id")).alias("y")
    )
    k1 = df.select(zorder_key(df, ["x", "y"], bounds={"x": (0, 99), "y": (0, 99)}).alias("z"))
    k2 = df.select(zorder_key(df, ["x", "y"]).alias("z"))  # derived bounds
    assert sorted(r["z"] for r in k1.collect()) == sorted(r["z"] for r in k2.collect())
    zs = [r["z"] for r in k1.collect()]
    assert all(0 <= z < (1 << 32) for z in zs)
    assert len(set(zs)) == 100
