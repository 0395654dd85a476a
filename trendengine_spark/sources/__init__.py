"""Custom Spark data sources (PySpark Python Data Source API).

:mod:`.region` — the engine-native rendering of the reference's
acquisition stage (GEE ``ImageCollection.filterDate().filterBounds()
.getRegion()``), as a partitioned, filter-pushdown-capable source
instead of one driver-memory RPC.

:mod:`.versioned_sink` — the write side of the API: ``te_versioned``,
a transactional writer whose task/commit protocol publishes
manifest-versioned table commits (:mod:`trendengine_spark.tablelog`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from trendengine_spark.sources.region import RegionDataSource
from trendengine_spark.sources.versioned_sink import VersionedSinkDataSource


def register_sources(spark: SparkSession) -> None:
    """Register all engine data sources on this session (idempotent —
    re-registration replaces the entry). Python-source filter
    pushdown is opt-in in Spark 4.1; the region source's partition
    pruning depends on it, so enable it here (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(RegionDataSource)
    spark.dataSource.register(VersionedSinkDataSource)
