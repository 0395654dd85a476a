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
