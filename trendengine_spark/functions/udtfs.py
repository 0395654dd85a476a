"""Python UDTFs (Spark 4 user-defined table functions).

The engine's extension point for per-group STATEFUL row expansion in
SQL: a UDTF with a ``TABLE(...) PARTITION BY ... ORDER BY (...)``
argument receives one ordered group per instance (``eval`` per row,
``terminate`` at group end) and may emit any number of output rows —
the SQL-front-end twin of ``applyInPandas`` for algorithms that are
naturally streaming/one-pass rather than whole-group-matrix shaped.

First resident: run-length segmentation of an event stream (the
RLE/gaps-and-islands primitive behind sessionization, state-machine
mining and compression). It is deliberately SQL-expressible so the
DuckDB oracle can hash-check the UDTF execution path end-to-end —
the point is proving the registration/partitioning/ordering plumbing,
not hiding novel math in Python.

Scale notes: one shuffle keyed by the PARTITION BY column (identical
to the applyInPandas analytical core); state per instance is O(1)
(the open run). Arrow is enabled for the Python boundary
(``useArrow=True``) so rows cross in columnar batches.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(
    returnType="user_id bigint, event_type string, run_start timestamp,"
    " run_len int",
    useArrow=True,
)
class RunLengthSegments:
    """Collapse consecutive same-type events per user into
    (type, start, length) runs. Rows arrive ordered by
    (ts, event_id) within a user partition; state is the open run."""

    def __init__(self) -> None:
        self.cur: list | None = None

    def eval(self, row):
        u, t, ts = row["user_id"], row["event_type"], row["ts"]
        if self.cur is not None and self.cur[0] == u and self.cur[1] == t:
            self.cur[3] += 1
        else:
            if self.cur is not None:
                yield tuple(self.cur)
            self.cur = [u, t, ts, 1]

    def terminate(self):
        if self.cur is not None:
            yield tuple(self.cur)


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the engine's UDTFs on a session."""
    spark.udtf.register("run_length_segments", RunLengthSegments)
