"""Z-order curve clustering: key math vs a Python reference,
locality/layout properties of the range-partitioned write."""

from __future__ import annotations

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trendengine_spark.operators.spatial import cluster_by_curve, morton_key


def _morton_ref(x: int, y: int) -> int:
    """Bit-at-a-time reference interleave (independent formulation)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_reference(spark):
    pts = [(x, y) for x in (0, 1, 5, 255, 1023, 65535) for y in (0, 2, 7, 511, 65535)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)


def test_morton_prefix_coarsens_grid(spark):
    """Dropping 2k low bits of the key = coarsening each axis by 2^k
    cells — prefix grouping must equal grouping by the coarse cell."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    out = df.select(
        (F.shiftright(morton_key(F.col("x"), F.col("y")), 4)).alias("coarse_z"),
        morton_key(
            F.shiftright(F.col("x"), 2), F.shiftright(F.col("y"), 2)
        ).alias("tile_z"),
    )
    assert out.filter(F.col("coarse_z") != F.col("tile_z")).count() == 0


def test_cluster_by_curve_layout(spark, tmp_path):
    """Written files must cover disjoint key ranges (tight min-max
    stats = row-group pruning) and be sorted within partitions."""
    pts = [(x * 7 % 256, y * 13 % 256) for x in range(64) for y in range(16)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    clustered = cluster_by_curve(
        df, morton_key(F.col("x"), F.col("y")), num_partitions=4
    )
    path = str(tmp_path / "zorder")
    clustered.write.parquet(path)

    ranges = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        pdf = pd.read_parquet(f)
        if pdf.empty:
            continue
        assert pdf["_zkey"].is_monotonic_increasing  # sorted within file
        ranges.append((pdf["_zkey"].min(), pdf["_zkey"].max()))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files


def test_polygon_contains_matches_reference_ray_cast(spark):
    """r8 polygon AOI: the codegen parity expression must agree with
    a straightforward Python ray caster on a grid incl. concave
    polygons; horizontal edges must not poison the result."""
    from pyspark.sql import functions as F

    from trendengine_spark.operators.spatial import polygon_contains

    def ref_inside(px, py, poly):
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if ((y1 > py) != (y2 > py)) and (
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
            ):
                inside = not inside
        return inside

    # concave "arrowhead" with a horizontal edge
    poly = [(0.0, 0.0), (10.0, 0.0), (5.0, 4.0), (10.0, 8.0), (0.0, 8.0)]
    pts = [
        (x / 2.0 + 0.01, y / 2.0 + 0.017)
        for x in range(-2, 24)
        for y in range(-2, 20)
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["x"], r["y"]): r["in_poly"]
        for r in df.withColumn(
            "in_poly", polygon_contains(F.col("x"), F.col("y"), poly)
        ).collect()
    }
    for px, py in pts:
        assert got[(px, py)] == ref_inside(px, py, poly), (px, py)
    # degenerate polygon rejected
    import pytest

    with pytest.raises(ValueError):
        polygon_contains(F.col("x"), F.col("y"), [(0, 0), (1, 1)])
