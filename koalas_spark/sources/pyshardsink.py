"""Training-shard sink via the Spark 4 Python Data Source API.

`df.write.format("shardsink").option("path", dir).save()` writes one
JSONL shard per partition on the executors and a `_manifest.json` on
the driver at commit — the export format a training loader wants
(shards + a manifest of row/byte counts to schedule workers against).

This exercises the full two-phase write protocol the Python DS API
exposes: `write` runs per-partition and stages into a per-JOB staging
directory (task retries never leave partial visible files), returns a
pickled commit message, and the driver's `commit` renames the staged
shards into place, clears prior shards on overwrite, and publishes
the manifest — exactly the atomic-publish shape a 100 TB export
needs; `abort` removes the whole staging dir. On a cluster the local
rename becomes an object-store multipart complete; the protocol shape
is identical.

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
    """Tasks stage into a per-JOB subdirectory (`.staging-<job>/`);
    only the driver's commit() renames shards into the target dir, so
    nothing from a failed/overlapping job is ever visible in place.
    The job id is minted driver-side in __init__ and travels to every
    task via pickling, which is what makes the staging dir job-scoped.

    Reads MUST go through the manifest (the shardsink reader does):
    the manifest names exactly the committed shard set, whereas a glob
    over shard-*.jsonl would double-count shards left by earlier jobs
    in append mode."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.schema = schema
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex

    def _staging(self) -> str:
        return os.path.join(self.path, f".staging-{self.job_id}")

    def write(self, rows: Iterator[Row]) -> ShardCommit:
        # executor-side: write to a tmp name inside the job's staging
        # dir, rename (same-dir, atomic) on task success
        os.makedirs(self._staging(), exist_ok=True)
        final = f"shard-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self._staging(), f".{final}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        size = os.path.getsize(tmp)
        os.rename(tmp, os.path.join(self._staging(), final))
        return ShardCommit(filename=final, rows=n, n_bytes=size)

    def commit(self, messages: list[ShardCommit]) -> None:
        import shutil

        if self.overwrite:
            # drop every previously committed shard before publishing:
            # overwrite means the new job's set replaces the old one
            for old in os.listdir(self.path):
                if old.startswith("shard-") and old.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, old))
        for m in messages:
            os.rename(
                os.path.join(self._staging(), m.filename),
                os.path.join(self.path, m.filename),
            )
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
        # staging dir also holds tmp files of failed task attempts —
        # removing it wholesale is the cleanup
        shutil.rmtree(self._staging(), ignore_errors=True)

    def abort(self, messages: list[ShardCommit]) -> None:
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)


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
