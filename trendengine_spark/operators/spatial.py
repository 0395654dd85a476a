"""Space-filling-curve clustering (SURVEY §4.1's deferred "spatial
locality optimization", made first-class).

The reference's v2 roadmap floats a locality optimization for pixel
access (`/root/reference/TrendEngine/READ.me:28-33` describes
region-by-region acquisition; SURVEY §4.1 defers the curve layout).
The engine-side rendering is the standard warehouse technique:
Z-ORDER (Morton) keys over the 2-D coordinate domain, used two ways —

- **layout**: :func:`cluster_by_curve` range-partitions and sorts a
  table by its Morton key before writing, so parquet row-group
  min/max stats become tight 2-D tiles and a bbox predicate prunes
  most row groups at scan time. At 100 TB this is an ingest-time
  decision: one range shuffle, amortized over every later query
  (the same reason Delta/Iceberg expose ``ZORDER BY`` / sort
  orders).
- **query**: :func:`morton_key` is an ordinary JVM expression
  column (quantize → bit-spread → interleave; no UDF), so coarse
  spatial roll-ups group by a key prefix instead of a 2-D pair,
  and the grouping key co-locates neighboring cells.

Bit-spreading uses the classic mask cascade (public-domain
"Interleave bits by Binary Magic Numbers" — Stanford bit-twiddling
collection); each 16-bit coordinate spreads into the even bits of a
32-bit lane in 4 shift-mask steps, all in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) cascade spreading a 16-bit int into even bit
#: positions of a 32-bit lane. Masks as BIGINT-safe Python ints.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` into even bit positions."""
    out = c
    for shift, mask in _SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton_key(cx: Column, cy: Column) -> Column:
    """Morton (Z-order) key of two integer cell coordinates.

    ``cx``/``cy`` must already be quantized to [0, 2^16) integer
    cells (callers own the domain→cell mapping so it can be exact —
    e.g. integral quantities directly, 2-dp decimals via
    ``round(x*100)``). Pure codegen bit arithmetic, long-typed
    output: x occupies even bits, y odd bits, so lexicographic key
    order walks the Z curve and prefix truncation coarsens the grid.
    """
    zx = _spread_bits(cx.cast("long"))
    zy = _spread_bits(cy.cast("long"))
    return zx.bitwiseOR(F.shiftleft(zy, 1)).alias("zkey")


def cluster_by_curve(
    df: DataFrame, key: Column, num_partitions: int | None = None
) -> DataFrame:
    """Range-partition and sort ``df`` by a curve key — the write-side
    layout step. Each output partition covers one contiguous key
    range (a compact 2-D tile region), so per-file/row-group min-max
    stats are tight and bbox scans prune. One range shuffle (sampled
    bounds), sort within partitions only — no global sort barrier.
    """
    with_key = df.withColumn("_zkey", key)
    parts = (
        with_key.repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else with_key.repartitionByRange("_zkey")
    )
    return parts.sortWithinPartitions("_zkey")


def polygon_contains(
    x: Column, y: Column, vertices: list[tuple[float, float]]
) -> Column:
    """Point-in-polygon as ONE codegen boolean expression (r8) —
    the general-AOI upgrade the reference's UI explicitly disabled
    (draw control allows only marker/rectangle,
    /root/reference/TrendEngine/static/utils.js:104-110, so bbox was
    the required semantics; this closes the polygon case the form
    grammar reserved). Standard ray casting: a point is inside iff a
    +x ray crosses an odd number of edges; each edge contributes the
    crossing test ((y1 > y) != (y2 > y)) AND x < x_at_y(edge), and
    the parity accumulates as boolean XOR — a fixed expression tree
    per polygon (no UDF, no join), so the filter runs inside
    whole-stage codegen and pushes nothing to Python. Horizontal
    edges contribute no crossing (the first clause is false; the
    IEEE ±inf from the slope division is never compared into the
    result). Boundary points follow the half-open crossing rule —
    deterministic and identical on any IEEE engine evaluating the
    same formula (the oracle twin generates the same unrolled text).
    """
    inside = F.lit(False)
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        crosses = (F.lit(y1) > y) != (F.lit(y2) > y)
        xcut = (
            F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        )
        inside = F.when(crosses & (x < xcut), ~inside).otherwise(inside)
    return inside


def polygon_contains_sql(
    x: str, y: str, vertices: list[tuple[float, float]]
) -> str:
    """The identical ray-casting parity unrolled as ANSI SQL text
    (for the DuckDB oracle twin): XOR of per-edge crossing tests.
    Formula and constant spellings match :func:`polygon_contains`
    exactly so both engines evaluate the same IEEE expression."""
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1!r} > {y}) != ({y2!r} > {y}))"
            f" AND ({x} < ({x2 - x1!r} * ({y} - {y1!r}) / {y2 - y1!r}"
            f" + {x1!r})) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
