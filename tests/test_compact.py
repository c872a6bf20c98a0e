"""compact_cells / uncompact_cells: roundtrip, minimality, idempotence,
mixed-res input, and the DuckDB unrolled-SQL twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import cells


def cell_of(res, ix, iy):
    return res * 2**58 + ix * 2**29 + iy


def cells_df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "cell long")


def collect_cells(df):
    return sorted(r["cell"] for r in df.collect())


class TestCompact:
    def test_complete_block_promotes(self, spark):
        # the 4 children of (res 3, 2, 5) and one stray cell
        kids = [cell_of(4, 4 + dx, 10 + dy) for dx in (0, 1) for dy in (0, 1)]
        stray = cell_of(4, 0, 0)
        out = collect_cells(cells.compact_cells(cells_df(spark, kids + [stray])))
        assert out == sorted([cell_of(3, 2, 5), stray])

    def test_cascading_promotion(self, spark):
        # all 16 res-4 cells under one res-2 cell -> collapses two levels
        kids = [
            cell_of(4, 8 + dx, 4 + dy) for dx in range(4) for dy in range(4)
        ]
        out = collect_cells(cells.compact_cells(cells_df(spark, kids)))
        assert out == [cell_of(2, 2, 1)]

    def test_min_res_stops_promotion(self, spark):
        kids = [
            cell_of(4, 8 + dx, 4 + dy) for dx in range(4) for dy in range(4)
        ]
        out = collect_cells(
            cells.compact_cells(cells_df(spark, kids), min_res=3)
        )
        assert out == sorted(
            cell_of(3, 4 + dx, 2 + dy) for dx in (0, 1) for dy in (0, 1)
        )

    def test_incomplete_block_untouched(self, spark):
        kids = [cell_of(5, 0, 0), cell_of(5, 0, 1), cell_of(5, 1, 0)]
        out = collect_cells(cells.compact_cells(cells_df(spark, kids)))
        assert out == sorted(kids)

    def test_mixed_res_input_and_dedup(self, spark):
        # a parent plus 4 children of ANOTHER parent, with duplicates
        kids = [cell_of(6, 2 + dx, 2 + dy) for dx in (0, 1) for dy in (0, 1)]
        mixed = kids + kids[:2] + [cell_of(5, 9, 9)]
        out = collect_cells(cells.compact_cells(cells_df(spark, mixed)))
        assert out == sorted([cell_of(5, 1, 1), cell_of(5, 9, 9)])

    def test_roundtrip_and_idempotence_fuzz(self, spark):
        rng = np.random.default_rng(5)
        res = 6
        n = 2**res
        # clustered sample so complete sibling groups actually occur
        ix = rng.integers(0, 8, 400) + 16
        iy = rng.integers(0, 8, 400) + 16
        vals = sorted({cell_of(res, int(x), int(y)) for x, y in zip(ix, iy)})
        df = cells_df(spark, vals)
        compacted = cells.compact_cells(df).localCheckpoint()
        comp_vals = collect_cells(compacted)
        assert len(comp_vals) < len(vals)  # something promoted
        # no cell is an ancestor of another
        got = set(comp_vals)
        for c in comp_vals:
            r = c >> 58
            cx, cy = (c % 2**58) >> 29, c % 2**29
            for up in range(1, r + 1):
                assert cell_of(r - up, cx >> up, cy >> up) not in got
        # uncompact back to the original res reproduces the input exactly
        back = collect_cells(cells.uncompact_cells(compacted, res))
        assert back == vals
        # idempotence
        again = collect_cells(cells.compact_cells(compacted))
        assert again == comp_vals

    def test_uncompact_rejects_finer_cells(self, spark):
        df = cells_df(spark, [cell_of(6, 3, 3)])
        with pytest.raises(Exception):
            cells.uncompact_cells(df, 4).collect()

    def test_sql_twin_matches(self, spark):
        import duckdb

        rng = np.random.default_rng(9)
        res = 5
        ix = rng.integers(0, 6, 300) + 4
        iy = rng.integers(0, 6, 300) + 4
        vals = sorted({cell_of(res, int(x), int(y)) for x, y in zip(ix, iy)})
        spark_out = collect_cells(
            cells.compact_cells(cells_df(spark, vals), min_res=2)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE c AS SELECT * FROM (VALUES "
            + ",".join(f"({v})" for v in vals)
            + ") t(cell)"
        )
        sql = cells.compact_unroll_sql("SELECT cell FROM c", res, 2)
        duck_out = sorted(r[0] for r in con.execute(sql).fetchall())
        assert duck_out == spark_out
