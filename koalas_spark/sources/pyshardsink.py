"""Training-shard sink via the Spark 4 Python Data Source API.

`df.write.format("shardsink").option("path", dir).save()` writes one
JSONL shard per partition on the executors and a `_manifest.json` on
the driver at commit — the export format a training loader wants
(shards + a manifest of row/byte counts to schedule workers against).

This exercises the full two-phase write protocol the Python DS API
exposes: `write` runs per-partition and stages to a temp name that is
renamed into place only on success (task retries never leave partial
visible files), returns a pickled commit message, and the driver's
`commit` publishes the manifest — exactly the atomic-publish shape a
100 TB export needs; `abort` removes any staged shard. On a cluster
the local rename becomes an object-store multipart complete; the
protocol shape is identical.

Reference parity: the reference's only sink is `dataframe.d:128
toCsv` (single file, eager); this is its distributed, transactional
generalization.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class ShardCommit(WriterCommitMessage):
    filename: str
    rows: int
    n_bytes: int


class ShardSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.schema = schema
        self.overwrite = overwrite

    def write(self, rows: Iterator[Row]) -> ShardCommit:
        # executor-side: stage under a temp name, rename on success
        os.makedirs(self.path, exist_ok=True)
        final = f"shard-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, f".{final}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        size = os.path.getsize(tmp)
        os.rename(tmp, os.path.join(self.path, final))
        return ShardCommit(filename=final, rows=n, n_bytes=size)

    def commit(self, messages: list[ShardCommit]) -> None:
        manifest = {
            "shards": [
                {"file": m.filename, "rows": m.rows, "bytes": m.n_bytes}
                for m in messages
            ],
            "total_rows": sum(m.rows for m in messages),
            "total_bytes": sum(m.n_bytes for m in messages),
            "schema": self.schema.json(),
        }
        with open(os.path.join(self.path, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)

    def abort(self, messages: list[ShardCommit]) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class ShardPartition(InputPartition):
    def __init__(self, filename: str):
        self.filename = filename


class ShardSourceReader(DataSourceReader):
    """Manifest-driven reads: one InputPartition per shard file, so
    read parallelism equals shard count and a scheduler (or a training
    loader) can place work by the manifest's row/byte counts without
    opening a single shard."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.schema = schema

    def partitions(self) -> list[ShardPartition]:
        manifest = json.load(open(os.path.join(self.path, "_manifest.json")))
        return [ShardPartition(s["file"]) for s in manifest["shards"]]

    def read(self, part: ShardPartition) -> Iterator[tuple]:
        fields = [f.name for f in self.schema.fields]
        with open(os.path.join(self.path, part.filename)) as f:
            for line in f:
                rec = json.loads(line)
                yield tuple(rec.get(name) for name in fields)


class ShardSinkSource(DataSource):
    """Register with `spark.dataSource.register(ShardSinkSource)`.

    Write: `df.write.format("shardsink").option("path", p)
    .mode("append").save()`. Read back: `spark.read
    .schema(...).format("shardsink").option("path", p).load()` —
    the user schema projects the JSONL records (schema-on-read)."""

    @classmethod
    def name(cls) -> str:
        return "shardsink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ShardSinkWriter(self.options, schema, overwrite)

    def reader(self, schema: StructType) -> DataSourceReader:
        return ShardSourceReader(self.options, schema)
