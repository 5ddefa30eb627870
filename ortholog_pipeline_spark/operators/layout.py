"""Data-layout operators: Z-order (Morton) interleaving for multi-dimensional
clustering.

Why it matters at 100 TB: sorting a table by ONE column gives perfect file
skipping on that column and none on any other. Interleaving the bits of two
(or more) dimension keys and range-partitioning on the interleaved value keeps
files tight in EVERY interleaved dimension at once — per-file min/max stats
then prune scans for predicates on either column (the technique Delta/Iceberg
expose as OPTIMIZE ZORDER BY). The interleave itself is pure integer
shift/mask arithmetic — codegen, map-side, engine-portable (the DuckDB oracle
reproduces it with the same `>> & <<` ops).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints of ``bits`` bits each into a
    2*bits-bit key: x's bit i lands at 2i, y's at 2i+1. Callers normalize the
    dimensions into [0, 2^bits) first (modulo-bucket or rank)."""
    xs = x.cast("long")
    ys = y.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key2_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as a DuckDB SQL expression (oracle parity)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)
