"""``te_versioned``: transactional writer data source (Python
DataSource API, write side).

The read-side Python source (``te_region``) covered acquisition;
this covers the OTHER half of the API surface: a
:class:`~pyspark.sql.datasource.DataSourceWriter` whose task/commit
protocol drives the manifest-versioned table layer
(:mod:`trendengine_spark.tablelog`):

- each task writes its partition to an immutable uniquely-named
  parquet file in the table's ``data/`` pool (invisible until
  committed) and returns the file name as its
  :class:`WriterCommitMessage`;
- ``commit`` (driver-side, runs ONCE after every task succeeded)
  publishes one atomic manifest naming exactly the committed files —
  Spark's job-level commit protocol becomes the table's version
  commit, so a failed/speculated/retried task can never leak partial
  output into a visible version;
- ``abort`` deletes the staged files.

``mode('append')`` folds the previous version's file list into the
new manifest (no data rewrite); ``mode('overwrite')`` publishes only
the new files as the next version — either way old versions remain
readable (time travel) until vacuum.

Usage::

    df.write.format("te_versioned").mode("append").save(path)
    read_versioned(spark, path)            # newest committed version
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql import types as T


@dataclass
class _FileMessage(WriterCommitMessage):
    name: str | None  # None = empty partition, nothing staged


_ARROW_TYPES = {
    T.LongType: "int64",
    T.IntegerType: "int32",
    T.DoubleType: "float64",
    T.FloatType: "float32",
    T.StringType: "string",
    T.BooleanType: "bool",
}


class VersionedWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("te_versioned requires a save path")
        self.schema = schema
        self.overwrite = overwrite
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)

    # executor-side: one immutable file per non-empty partition
    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _FileMessage(None)
        names = [f.name for f in self.schema.fields]
        cols = {n: [r[i] for r in rows] for i, n in enumerate(names)}
        arrays = []
        for f in self.schema.fields:
            at = _ARROW_TYPES.get(type(f.dataType))
            if at is not None:
                arrays.append(pa.array(cols[f.name], type=at))
            elif isinstance(f.dataType, T.TimestampType):
                arrays.append(
                    pa.array(cols[f.name], type=pa.timestamp("us"))
                )
            else:
                arrays.append(pa.array(cols[f.name]))
        table = pa.Table.from_arrays(arrays, names=names)
        name = f"{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(self.path, "data", name))
        return _FileMessage(name)

    # driver-side, once, only after all tasks succeeded: THE commit
    def commit(self, messages):
        from trendengine_spark.tablelog import (
            _commit_manifest,
            _read_manifest,
            current_version,
        )

        new_files = [m.name for m in messages if m and m.name]
        if self.overwrite:
            # self-contained file list: a lost optimistic-concurrency
            # race can safely retry at the next version slot
            _commit_manifest(self.path, new_files)
            return
        # append FOLDS the previous file list into the manifest, so a
        # lost race must REBASE on the winner's manifest, never retry
        # with the stale list (that would silently drop the winner's
        # files — ADVICE r6 fix)
        while True:
            prev = current_version(self.path)
            files = new_files
            if prev >= 0:
                files = _read_manifest(self.path, prev)["files"] + new_files
            try:
                _commit_manifest(
                    self.path, files, on_conflict="raise", base_version=prev
                )
                return
            except FileExistsError:
                continue

    def abort(self, messages):
        for m in messages:
            if m and m.name:
                try:
                    os.remove(os.path.join(self.path, "data", m.name))
                except OSError:
                    pass


class VersionedSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "te_versioned"

    def writer(self, schema: T.StructType, overwrite: bool):
        return VersionedWriter(self.options, schema, overwrite)
