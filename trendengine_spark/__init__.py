"""trendengine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference engine
(OlaMag/TrendEngine, surveyed in SURVEY.md): long-format time-series
scans, temporal/spatial predicate filters, annual/monthly mean
composites, per-series quality gates, per-series model fitting
(PolyTrend trend classification, DBEST change detection), categorical
roll-up statistics — plus the standard relational closure (joins,
windows, set ops, grouped analytics) and large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Architecture: everything is declared through the DataFrame / Spark SQL
API so Catalyst handles predicate pushdown, column pruning, partial
aggregation and join planning; the only Python-side execution is
Arrow-batched ``applyInPandas`` for the per-series numerical fits
(PolyTrend / DBEST / STL), which are numpy-bound by nature.
"""

from trendengine_spark.session import get_spark
from trendengine_spark.tables import load_tables, table_path

__all__ = ["get_spark", "load_tables", "table_path"]

__version__ = "0.1.0"
