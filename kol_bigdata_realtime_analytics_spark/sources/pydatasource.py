"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The modern extension point for sources Spark has no built-in connector
for — internal services, proprietary formats, synthetic generators. The
contract: a `DataSource` declares schema + options, its `DataSourceReader`
declares PARTITIONS (the parallelism unit — each partition reads
independently on an executor; no driver bottleneck), and `read(partition)`
yields that partition's rows (Arrow-batched by the runtime).

`DetRangeDataSource` here is a deterministic generator: row ids are
GLOBALLY determined by (partition, offset), and every value is a pure
function of the id — so the SAME dataset materializes at any parallelism,
which is what makes the source oracle-checkable end-to-end (the DuckDB
oracle recomputes the identical rows from `range()`).

Registration is per-session: `register_detrange(spark)`; then
    spark.read.format("detrange").option("n", "100000")
         .option("partitions", "8").load()
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: janitor grace window (seconds): another job's `_staging-*` dir / stale
#: commit lock is only swept when older than this. Module-scope so tests
#: assert against the product constant instead of a duplicated literal.
JANITOR_GRACE_SEC = 3600.0


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DetRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.n_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        step = (self.n + self.n_partitions - 1) // self.n_partitions
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        # deterministic row content: pure function of the global id
        for i in range(partition.start, partition.end):
            yield (i, (i % 997) / 100.0, f"k{i % 13}")


class DetRangeDataSource(DataSource):
    """format("detrange"): id bigint, v double, k string."""

    @classmethod
    def name(cls) -> str:
        return "detrange"

    def schema(self) -> str:
        return "id bigint, v double, k string"

    def reader(self, schema):
        return DetRangeReader(self.options)


def register_detrange(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(DetRangeDataSource)


# ---------------------------------------------------------------------------
# Streaming Python DataSource (Spark 4 SimpleDataSourceStreamReader) — the
# custom STREAMING source seam. The container has no Kafka broker, so this
# deterministic generator is the testable stand-in for "a source Spark has
# no built-in streaming connector for": offsets are explicit dicts the
# engine checkpoints, read(start) returns one micro-batch plus the next
# offset, and readBetweenOffsets replays any committed range for recovery
# — the exact one-partition contract (deterministic replay from offsets)
# a Kafka-like source must honor. Reference semantics:
# streaming/spark_jobs/features_stream.py:124-132 (the reference's Kafka
# readStream entry) re-expressed through the public Python API.
# ---------------------------------------------------------------------------

try:  # pragma: no cover — API present in Spark 4; guarded for older runtimes
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class DetStreamReader(SimpleDataSourceStreamReader):
        """Micro-batches of `batch` rows: row j = (j, type_{j%3}, j%7/1.0).

        Row content is a pure function of the global row index j, and the
        offset is just {"i": next_j} — so any (start, end) range replays
        bit-identically, which is the recovery contract."""

        def __init__(self, options):
            self.batch = int(options.get("batch", "100"))

        @staticmethod
        def _rows(lo: int, hi: int):
            return [(j, f"type_{j % 3}", float(j % 7)) for j in range(lo, hi)]

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            i = int(start["i"])
            return iter(self._rows(i, i + self.batch)), {"i": i + self.batch}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(int(start["i"]), int(end["i"])))

    class DetStreamDataSource(DataSource):
        """readStream.format("detstream"): event_id bigint, event_type string, value double."""

        @classmethod
        def name(cls) -> str:
            return "detstream"

        def schema(self) -> str:
            return "event_id bigint, event_type string, value double"

        def simpleStreamReader(self, schema):
            return DetStreamReader(self.options)

    def register_detstream(spark) -> None:
        """Idempotently register the streaming source with a session."""
        spark.dataSource.register(DetStreamDataSource)

except ImportError:  # pragma: no cover
    SimpleDataSourceStreamReader = None  # type: ignore[assignment]

    _MSG = (
        "SimpleDataSourceStreamReader requires Spark 4's "
        "pyspark.sql.datasource streaming API"
    )

    class DetStreamReader:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise NotImplementedError(_MSG)

    class DetStreamDataSource:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise NotImplementedError(_MSG)

    def register_detstream(spark) -> None:  # type: ignore[misc]
        raise NotImplementedError(_MSG)


# ---------------------------------------------------------------------------
# Python DataSource WRITER (Spark 4 batch write API) — the missing half of
# the custom-connector seam: DetRange/DetStream cover reads; this covers
# df.write.format(...) with real commit/abort transaction semantics.
# ---------------------------------------------------------------------------

try:
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _JsonDirCommit(WriterCommitMessage):
        """Per-task commit message: the staged file to publish + row count.
        Must stay picklable (it travels executor -> driver)."""

        def __init__(self, filename: str, n_rows: int):
            self.filename = filename
            self.n_rows = n_rows

    class JsonDirWriter(DataSourceWriter):
        """Writes each partition to a PER-JOB staging dir; the driver commit
        publishes staged files into the target directory and writes a
        _SUCCESS manifest; abort removes this job's staging — so readers
        never observe a half-written dataset (the file-sink staging/rename
        protocol, expressed through the Python writer API). Staging is
        job-scoped (`_staging-<job uuid>`, chosen on the driver and shipped
        in the pickled writer) because abort RACES still-running tasks: a
        zombie task can recreate a shared staging dir after abort's rmtree
        (observed under full-suite load). A leftover dir from an aborted
        job is inert — the next successful commit's janitor sweeps every
        `_staging-*`. Local-FS here; at scale the same two-phase shape
        targets an object store."""

        def __init__(self, options, overwrite: bool):
            import uuid

            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsondir writer requires .save(path)")
            self.overwrite = overwrite
            self.staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")

        def write(self, iterator):
            import json
            import uuid

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self.staging, exist_ok=True)
            fname = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.staging, fname), "w") as f:
                for row in iterator:
                    # recursive: nested Rows flatten to dicts; default=str
                    # covers timestamp/date/Decimal/bytes (non-JSON-native
                    # types round-trip as their string forms — documented
                    # lossy, like every text sink)
                    f.write(
                        json.dumps(row.asDict(recursive=True), default=str) + "\n"
                    )
                    n += 1
            return _JsonDirCommit(fname, n)

        #: janitor grace: another job's `_staging-*` dir is only swept when
        #: its mtime is older than this — a LIVE concurrent job's staging
        #: must never be rmtree'd out from under its tasks (r7 advisory:
        #: the unconditional sweep made two concurrent appends to one path
        #: mutually fatal). An aborted job's leftover is inert and gets
        #: collected once it ages out.
        _JANITOR_GRACE_SEC = JANITOR_GRACE_SEC

        def commit(self, messages):
            import glob
            import json
            import shutil
            import time

            if self.overwrite:
                for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                    os.remove(old)
            manifest_path = os.path.join(self.path, "_SUCCESS")
            lock_path = os.path.join(self.path, "_SUCCESS.lock")
            # serialize the manifest read-modify-write across concurrent
            # committers (driver-side, once per job — contention is rare and
            # bounded): O_EXCL create is the atomic take; a crashed holder's
            # stale lock ages out on the same grace clock as staging dirs.
            deadline = time.monotonic() + 30.0
            while True:
                try:
                    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                    break
                except FileExistsError:
                    try:
                        if time.time() - os.stat(lock_path).st_mtime > self._JANITOR_GRACE_SEC:
                            os.remove(lock_path)
                            continue
                    except OSError:
                        continue  # holder released between stat and remove
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"jsondir commit: manifest lock {lock_path} held >30s"
                        )
                    time.sleep(0.05)
            try:
                total, files = 0, 0
                if not self.overwrite and os.path.exists(manifest_path):
                    # append: the manifest describes the whole committed
                    # dataset, not just this job (r7 review)
                    with open(manifest_path) as f:
                        prev = json.load(f)
                    total, files = prev.get("n_rows", 0), prev.get("n_files", 0)
                for m in messages:
                    os.replace(
                        os.path.join(self.staging, m.filename),
                        os.path.join(self.path, m.filename),
                    )
                    total += m.n_rows
                    files += 1
                # atomic manifest publish: temp + rename, so a concurrent
                # reader never observes a torn _SUCCESS
                tmp = manifest_path + f".tmp-{os.path.basename(self.staging)}"
                with open(tmp, "w") as f:
                    json.dump({"n_rows": total, "n_files": files}, f)
                os.replace(tmp, manifest_path)
            finally:
                try:
                    os.remove(lock_path)
                except OSError:
                    pass
            # janitor: this job's own staging always; OTHER jobs' staging
            # dirs only past the grace age (a live concurrent job's staging
            # is younger than that and must not be swept)
            shutil.rmtree(self.staging, ignore_errors=True)
            now = time.time()
            for d in glob.glob(os.path.join(self.path, "_staging-*")):
                try:
                    if now - os.stat(d).st_mtime > self._JANITOR_GRACE_SEC:
                        shutil.rmtree(d, ignore_errors=True)
                except OSError:
                    pass  # concurrently removed — fine

        def abort(self, messages):
            import shutil

            # best-effort: a still-running task may recreate this dir after
            # the rmtree; it stays inert and the next commit sweeps it
            shutil.rmtree(self.staging, ignore_errors=True)
            # committed data from previous successful writes stays intact

    class JsonDirDataSource(DataSource):
        """df.write.format("jsondir").mode(...).save(path): staged-commit
        jsonl directory sink."""

        @classmethod
        def name(cls) -> str:
            return "jsondir"

        def writer(self, schema, overwrite: bool):
            return JsonDirWriter(self.options, overwrite)

    def register_jsondir(spark) -> None:
        """Idempotently register the writer datasource with a session."""
        spark.dataSource.register(JsonDirDataSource)

except ImportError:  # pragma: no cover
    _WMSG = "DataSourceWriter requires Spark 4's pyspark.sql.datasource API"

    class JsonDirDataSource:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise NotImplementedError(_WMSG)

    def register_jsondir(spark) -> None:  # type: ignore[misc]
        raise NotImplementedError(_WMSG)


# ---------------------------------------------------------------------------
# WARC-like crawl-record reader — the record format every web-scale LLM
# corpus ingest starts from (header block + blank line + payload,
# one record per request). The reader does REAL record parsing
# (bytes -> header fields -> typed columns); record content is a
# deterministic pure function of the global record id, so a SQL oracle
# can re-derive every parsed field from range arithmetic and certify the
# synthesis -> serialize -> parse chain end to end (the detrange
# discipline, applied to a wire format instead of a row).
# ---------------------------------------------------------------------------


def _warcish_record_bytes(rid: int) -> bytes:
    """Serialize record `rid` into the WARC-like wire form. Payload tokens
    are tok{(rid*31+i) % 11} for i < (rid % 13) + 1, space-joined."""
    n_tok = (rid % 13) + 1
    payload = " ".join(f"tok{(rid * 31 + i) % 11}" for i in range(n_tok)).encode()
    status = 404 if rid % 5 == 0 else 200
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Record-ID: <urn:rec:{rid}>\r\n"
        f"WARC-Target-URI: https://site{rid % 7}.example/page/{rid}\r\n"
        f"WARC-Status: {status}\r\n"
        f"Content-Type: text/{'html' if rid % 3 else 'plain'}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return headers + b"\r\n" + payload


def _parse_warcish(raw: bytes):
    """Parse one record's bytes into typed fields — the real logic under
    test. Raises on malformed records (ingest must fail loudly)."""
    head, _, payload = raw.partition(b"\r\n\r\n")
    fields = {}
    for line in head.decode().split("\r\n")[1:]:  # [0] is the version line
        if not line:
            continue
        k, _, v = line.partition(": ")
        fields[k] = v
    declared = int(fields["Content-Length"])
    if declared != len(payload):
        raise ValueError(
            f"Content-Length {declared} != payload {len(payload)} "
            f"for {fields.get('WARC-Record-ID')}"
        )
    rid = int(fields["WARC-Record-ID"].split(":")[-1].rstrip(">"))
    return (
        rid,
        fields["WARC-Target-URI"],
        int(fields["WARC-Status"]),
        fields["Content-Type"],
        declared,
        len(payload.split(b" ")),
    )


class WarcishReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.n_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        step = (self.n + self.n_partitions - 1) // self.n_partitions
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        for rid in range(partition.start, partition.end):
            yield _parse_warcish(_warcish_record_bytes(rid))


class WarcishDataSource(DataSource):
    """format("warcish"): parsed crawl records."""

    @classmethod
    def name(cls) -> str:
        return "warcish"

    def schema(self) -> str:
        return (
            "rec_id bigint, url string, status int, content_type string, "
            "content_length bigint, n_tokens bigint"
        )

    def reader(self, schema):
        return WarcishReader(self.options)


def register_warcish(spark) -> None:
    spark.dataSource.register(WarcishDataSource)
