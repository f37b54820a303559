"""Z-order (Morton) clustering: multi-dimensional file-skipping layout.

The measurable claim: writing files z-ordered on (a, b) lets min/max footer
stats prune files for selective filters on EITHER column, while plain
single-key range clustering only prunes on its one key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.operators.layout import zorder_cluster, zorder_key


def _grid_df(spark, side=64):
    rows = [(x, y) for x in range(side) for y in range(side)]
    return spark.createDataFrame(rows, ["a", "b"])


def test_zorder_key_is_morton_interleave(spark):
    # 2 columns, bits=2 → grid 4x4; key = interleave(bits(a), bits(b))
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], ["a", "b"]
    )
    keyed, key = zorder_key(df, ["a", "b"], bits=2)
    got = {(r.a, r.b): r[key] for r in keyed.collect()}
    # min/max normalization maps 0..3 onto cells 0..3 exactly; Morton:
    # a-bit i → position 2i, b-bit i → position 2i+1
    def morton(a, b):
        out = 0
        for i in range(2):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    for (a, b), k in got.items():
        assert k == morton(a, b), (a, b, k)


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_files_prune_on_both_dimensions(spark, tmp_path):
    """Write a 64x64 uniform grid into 16 files twice: z-ordered on (a, b)
    vs range-clustered on a alone. For a selective filter on b (the
    NON-sort key of the baseline), the fraction of files whose [min_b,
    max_b] footer span survives must be far smaller under z-order; and
    z-order must stay competitive for filters on a."""
    df = _grid_df(spark)
    zpath, rpath = str(tmp_path / "zorder"), str(tmp_path / "range")
    zorder_cluster(df, ["a", "b"], n_partitions=16, bits=6).write.parquet(zpath)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(rpath)

    def surviving_files(path, col, lo, hi):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        total = len(per_file)
        alive = sum(1 for r in per_file if not (r.hi < lo or r.lo > hi))
        return alive, total

    # filter on b: baseline layout cannot prune at all (every file spans b)
    zb_alive, zb_total = surviving_files(zpath, "b", 10, 13)
    rb_alive, rb_total = surviving_files(rpath, "b", 10, 13)
    assert rb_alive == rb_total  # range-on-a layout: zero pruning on b
    assert zb_alive <= zb_total // 2, (zb_alive, zb_total)  # z-order prunes

    # filter on a: z-order still prunes (hyper-rectangles are compact in a too)
    za_alive, za_total = surviving_files(zpath, "a", 10, 13)
    assert za_alive <= za_total // 2, (za_alive, za_total)

    # layout changes nothing semantically
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(rpath).count()
        == 64 * 64
    )


def test_zorder_write_config_round_trip_and_exclusivity(spark, tmp_path):
    from platform_etl_backend_spark.engine.config import IOResourceConfig
    from platform_etl_backend_spark.engine.io import IOResource, write_single

    conf = IOResourceConfig.from_dict(
        {
            "format": "parquet",
            "path": str(tmp_path / "z"),
            "write_mode": "overwrite",
            "zorder_by": ["a", "b"],
            "zorder_partitions": 4,
            "zorder_bits": 6,
        }
    )
    assert conf.zorder_by == ("a", "b") and conf.zorder_partitions == 4
    with pytest.raises(ValueError, match="at least 2"):
        IOResourceConfig(format="parquet", path="/t", zorder_by=("a",))
    with pytest.raises(ValueError, match="excludes"):
        IOResourceConfig(
            format="parquet", path="/t", zorder_by=("a", "b"), coalesce=1
        )
    write_single(IOResource(_grid_df(spark, side=16), conf))
    out = spark.read.parquet(str(tmp_path / "z"))
    assert out.count() == 256 and set(out.columns) == {"a", "b"}  # __zkey dropped


def test_zorder_constant_column_degrades_gracefully(spark):
    df = spark.createDataFrame([(1, i) for i in range(10)], ["a", "b"])
    keyed, key = zorder_key(df, ["a", "b"], bits=4)
    # constant column contributes cell 0 everywhere; key is still ordered by b
    vals = [r[key] for r in keyed.orderBy("b").collect()]
    assert vals == sorted(vals)
