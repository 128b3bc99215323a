"""Z-order layout (io/zorder.py): key correctness and the measurable
pruning claim — per-file extents tighten on BOTH dimensions vs a
single-column time layout.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
from pyspark.sql import functions as F

from flink_tank_spark.io.zorder import morton_expr, sql_morton, zorder_layout


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton_matches_reference_and_oracle(spark):
    rng = np.random.default_rng(3)
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 1 << 16, size=(50, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", morton_expr("x", "y", 16)).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y, 16)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    for x, y, z in con.execute(
        f"SELECT x, y, {sql_morton('x', 'y', 16)} FROM pts"
    ).fetchall():
        assert z == _py_morton(x, y, 16)


def _file_stats(df, x_col, y_col):
    """Per output-partition min/max — the parquet footer stats a
    post-write scan would prune on."""
    return (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min(x_col).alias("xlo"), F.max(x_col).alias("xhi"),
            F.min(y_col).alias("ylo"), F.max(y_col).alias("yhi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )


def _spans(rows):
    n = sum(r["n"] for r in rows)
    return (
        sum((r["xhi"] - r["xlo"]) * r["n"] for r in rows) / n,
        sum((r["yhi"] - r["ylo"]) * r["n"] for r in rows) / n,
    )


def _files_overlapping(rows, xr, yr):
    return sum(
        r["xlo"] <= xr[1] and r["xhi"] >= xr[0]
        and r["ylo"] <= yr[1] and r["yhi"] >= yr[0]
        for r in rows
    )


def test_zorder_tightens_both_dimensions(spark):
    """Uniform (user, hour) points: a time-only range layout leaves
    every file spanning the FULL user axis; the Z-order layout bounds
    per-file extents on BOTH axes (measured ~dom/3 x, ~dom/5 y for 32
    files — each file a Z-curve segment), so predicates on either
    column prune. That is the trade Z-order makes: slightly wider time
    spans for the ability to skip on the second column at all."""
    rng = np.random.default_rng(11)
    n, dom = 20_000, 1 << 16
    pts = [(int(u), int(h)) for u, h in rng.integers(0, dom, size=(n, 2))]
    df = spark.createDataFrame(pts, "ux long, hy long")

    naive = _file_stats(
        df.repartitionByRange(32, "hy").sortWithinPartitions("hy"), "ux", "hy"
    )
    z = _file_stats(
        zorder_layout(df, "ux", "hy", bits=16, n_files=32), "ux", "hy"
    )
    nx, ny = _spans(naive)
    zx, zy = _spans(z)
    assert nx > 0.9 * dom, "time layout should span ~the full user axis"
    assert zx < nx / 2.5, f"z-order user span {zx:.0f} not <1/2.5 of {nx:.0f}"
    assert zy < 0.3 * dom, f"z-order hour span {zy:.0f} degenerated"

    # user-only predicate (the query the time layout CANNOT prune):
    user_probe = (0, dom // 8 - 1)
    n_naive = _files_overlapping(naive, user_probe, (0, dom))
    n_z = _files_overlapping(z, user_probe, (0, dom))
    assert n_naive == 32, "time layout reads every file for a user filter"
    assert n_z <= 16, f"z-order should skip >=half the files, read {n_z}"


def test_compact_zordered_files_prune_on_both_columns(spark, tmp_path):
    """The OPTIMIZE-style rewrite: many small files in, n_files Z-ordered
    files out, with real parquet footers whose min/max prune a
    two-column predicate."""
    import numpy as np
    from flink_tank_spark.io.tables import compact_zordered

    rng = np.random.default_rng(23)
    dom = 1 << 16
    pts = [(int(u), int(h)) for u, h in rng.integers(0, dom, size=(5000, 2))]
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    df = spark.createDataFrame(pts, "ux long, hy long")
    df.repartition(64).write.parquet(src)  # 64 small unclustered files

    compact_zordered(spark, src, dest, "ux", "hy", n_files=16)
    out = spark.read.parquet(dest)
    assert out.count() == 5000 and set(out.columns) == {"ux", "hy"}
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(files) <= 16

    # real footer stats: per-file extents from the written files
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        md = pq.ParquetFile(os.path.join(dest, f)).metadata
        lo_u = min(md.row_group(i).column(0).statistics.min
                   for i in range(md.num_row_groups))
        hi_u = max(md.row_group(i).column(0).statistics.max
                   for i in range(md.num_row_groups))
        spans.append(hi_u - lo_u)
    # a random unclustered file would span ~the full domain; z-ordered
    # files must be materially tighter on the NON-curve-leading column
    assert sum(spans) / len(spans) < 0.55 * dom

