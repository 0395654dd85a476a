"""Structured Streaming surface (SURVEY §2.6 streaming row, §7.1 P5).

The reference has no streaming at all (batch recomputation per HTTP
request, ``calculations/routes.py:22-33``); this package is the
engine's forward-looking twin: the same window operators the batch
queries declare (``queries/streaming_batch.py``), applied to a
``readStream`` source with watermarking, plus a stateful online
level-shift detector (``applyInPandasWithState``) as the streaming
twin of DBEST change detection.

Note on ``transformWithStateInPandas`` (the Spark 4 successor API
with typed value/list/map state and timers): its Python driver
worker requires ``google.protobuf``, which is not installed in this
build environment (verified: the streaming runner crashes with
``ImportError: cannot import name 'descriptor'``; installs are not
permitted here). The stateful surface therefore stays on
``applyInPandasWithState``, which is self-contained — the detector
port is mechanical once protobuf exists.
"""

from trendengine_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    stream_parquet_source,
    tumbling_agg,
)
from trendengine_spark.streaming.detector import online_level_shifts  # noqa: F401
from trendengine_spark.streaming.joins import (  # noqa: F401
    dedup_within_watermark,
    interval_join_views_purchases,
)
