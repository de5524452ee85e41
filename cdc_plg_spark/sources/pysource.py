"""Python DataSource plugin — the reference's pluggable-source contract
(/root/reference/README.md:17,:21 "sources feed ordered change events";
:59-68 plugin registration) realized through Spark 4's Python
DataSource API: a user-authored source registered by name and then
consumed with plain ``spark.read.format(name)`` — no JVM code, no
rebuild, exactly the plugin deployment story the RFC describes.

The shipped source is a deterministic CDC-event generator: every
(partition, row) pair maps to one synthetic change event through pure
integer arithmetic, so the output is reproducible across runs,
partitionings and engines — which is what lets the driver hash-check a
GENERATED table against a DuckDB ``range()`` oracle.

Scale notes: ``partitions()`` is the parallelism contract — each
InputPartition becomes one Spark task reading an id-range slice, so a
100 TB-scale generate (or a real source: a Kafka topic, a JDBC range
scan, an object-store listing) fans out without driver involvement.
Arrow-batched row delivery happens inside the worker; the generator
yields plain tuples, which the API batches.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# 2024-01-01T00:00:00Z in epoch seconds: the generator's time origin.
_EPOCH0 = 1_704_067_200
_EVENT_TYPES = ("view", "click", "purchase", "error")


class EventGenSource(DataSource):
    """format("cdc_eventgen") — options: rows (total), parts (tasks)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_eventgen"

    def schema(self) -> str:
        return ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type STRING, amount DOUBLE")

    def reader(self, schema) -> "EventGenReader":
        return EventGenReader(int(self.options.get("rows", 1000)),
                              int(self.options.get("parts", 4)))


class EventGenReader(DataSourceReader):
    def __init__(self, rows: int, parts: int) -> None:
        self.rows, self.parts = rows, parts

    def partitions(self):
        # contiguous id ranges: slice i covers [lo, hi)
        step = (self.rows + self.parts - 1) // self.parts
        return [InputPartition((i * step, min((i + 1) * step, self.rows)))
                for i in range(self.parts)]

    def read(self, partition: InputPartition):
        import datetime as _dt

        lo, hi = partition.value
        for i in range(lo, hi):
            # tz-AWARE datetimes: a naive value would be reinterpreted
            # through the worker's local timezone on conversion
            ts = _dt.datetime.fromtimestamp(
                _EPOCH0 + i * 60, tz=_dt.timezone.utc)
            yield (i, ts, i % 97,
                   _EVENT_TYPES[i % 4],
                   (i % 1000) / 100.0)


def register_python_sources(spark) -> None:
    """Idempotently register the plugin source on a session (the RFC's
    'register plugin by name' step)."""
    for src in (EventGenSource, EventGenStreamSource, JsonlSinkSource,
                KafkaFileSinkSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass  # already registered on this session


class EventGenStreamSource(DataSource):
    """format("cdc_eventgen_stream") — a BOUNDED replay stream: emits
    the same deterministic events as cdc_eventgen in `chunk`-row
    micro-batches until `rows` have been produced, then reports no new
    data.  Offsets are plain row indices, so checkpoint recovery
    (readBetweenOffsets) is exact replay — the RFC's resume-from-
    checkpoint-ts contract (README.md:65,:119) with the offset ledger
    played by Spark's commit log."""

    @classmethod
    def name(cls) -> str:
        return "cdc_eventgen_stream"

    def schema(self) -> str:
        return ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type STRING, amount DOUBLE")

    def simpleStreamReader(self, schema) -> "EventGenStreamReader":
        return EventGenStreamReader(int(self.options.get("rows", 1000)),
                                    int(self.options.get("chunk", 250)))


def _gen_rows(lo: int, hi: int):
    import datetime as _dt

    for i in range(lo, hi):
        ts = _dt.datetime.fromtimestamp(
            _EPOCH0 + i * 60, tz=_dt.timezone.utc)
        yield (i, ts, i % 97, _EVENT_TYPES[i % 4], (i % 1000) / 100.0)


try:  # Spark 4 simple-stream API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class EventGenStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, rows: int, chunk: int) -> None:
            self.rows, self.chunk = rows, chunk

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            lo = start["i"]
            hi = min(lo + self.chunk, self.rows)
            # iter(list), not a bare generator or list: the engine's
            # prefetch cache both copy.copy()s the iterator (generators
            # can't) and next()s it directly (lists can't) — a list
            # iterator supports both
            return iter(list(_gen_rows(lo, hi))), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return _gen_rows(start["i"], end["i"])

        def commit(self, end) -> None:
            pass
except ImportError:  # pragma: no cover - pre-4.0 Spark
    EventGenStreamReader = None  # type: ignore[assignment]


class KafkaFileSinkSource(DataSource):
    """format("cdc_kafka_sink") — the Kafka PRODUCER wire contract
    (README.md:17,:21 — the RFC's partition-routing sink plugin),
    file-backed because no broker exists in this container.  Input
    rows are exactly the producer record triple `format("kafka")`
    ships: (key STRING, value STRING, partition INT).  Each writer
    task appends the records of each topic-partition it sees to a
    private segment file IN ARRIVAL ORDER with a per-record sequence
    number (the broker's per-partition append log); the driver-side
    commit() publishes `_LEDGER.json` assigning each segment a
    cumulative base offset per partition.  That preserves Kafka's
    actual ordering guarantee — total order within a (producer task,
    partition), arbitrary interleave across producers — and makes the
    routing policy ROUND-TRIP-checkable: a reader can re-derive every
    record's partition from its file, replay per-segment order from
    seq, and reconcile against the ledger.  Swapping this for a real
    broker is the one-line `.format("kafka")` change; everything with
    engine semantics (routing, ordering, at-least-once commit) is
    exercised here.  Option: path (broker log directory)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_kafka_sink"

    def writer(self, schema, overwrite: bool) -> "KafkaFileWriter":
        names = [f.name for f in schema]
        for c in ("key", "value", "partition"):
            if c not in names:
                raise ValueError(
                    f"cdc_kafka_sink needs (key, value, partition) "
                    f"columns; got {names}")
        return KafkaFileWriter(self.options["path"])


class JsonlSinkSource(DataSource):
    """format("cdc_jsonl_sink") — a user-authored SINK plugin through
    the same Python DataSource API: each writer task streams its rows
    to a private part file, returns a commit message naming it, and
    the driver-side commit() publishes a manifest listing exactly the
    committed parts — the two-phase write/commit split the RFC's sink
    contract requires (README.md:99-119): a failed/retried task's
    uncommitted file is simply never manifested, so re-execution is
    idempotent.  Option: path (output directory)."""

    @classmethod
    def name(cls) -> str:
        return "cdc_jsonl_sink"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options["path"], [f.name for f in schema])


try:
    from pyspark.sql.datasource import (DataSourceArrowWriter,
                                        WriterCommitMessage)
    from dataclasses import dataclass

    @dataclass
    class _Part(WriterCommitMessage):
        filename: str
        n_rows: int

    class JsonlWriter(DataSourceArrowWriter):
        """Arrow-batched (r14, guide §4): the engine ships
        pyarrow.RecordBatches instead of an iterator of pickled Rows —
        one C-level columnar conversion per batch replaces a per-row
        Row deserialization + field lookup, and each batch's lines go
        through ONE writelines call.  Scalar JSON encoding is
        unchanged; nested values (no current caller writes any) now
        serialize as real JSON objects/arrays instead of str(Row)."""

        def __init__(self, path: str, columns: list) -> None:
            self.path, self.columns = path, columns

        def write(self, iterator):
            import json as _json
            import os as _os
            import uuid as _uuid

            _os.makedirs(self.path, exist_ok=True)
            name = f"part-{_uuid.uuid4().hex}.jsonl"
            n = 0
            dumps, cols = _json.dumps, self.columns
            with open(_os.path.join(self.path, name), "w") as f:
                for batch in iterator:
                    d = batch.to_pydict()
                    f.writelines(
                        dumps(dict(zip(cols, vals)), default=str) + "\n"
                        for vals in zip(*(d[c] for c in cols)))
                    n += batch.num_rows
            return _Part(filename=name, n_rows=n)

        def commit(self, messages) -> None:
            import json as _json
            import os as _os

            manifest = [{"file": m.filename, "n_rows": m.n_rows}
                        for m in messages if m is not None]
            with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                _json.dump(manifest, f)

        def abort(self, messages) -> None:
            import os as _os

            # the writer contract delivers None for tasks that failed
            # before returning a commit message — an AttributeError here
            # would mask the original write failure
            for m in messages:
                if m is None:
                    continue
                try:
                    _os.remove(_os.path.join(self.path, m.filename))
                except OSError:
                    pass
    @dataclass
    class _Segments(WriterCommitMessage):
        # [(partition, filename, n_records), ...] for one writer task
        segments: list

    class KafkaFileWriter(DataSourceArrowWriter):
        """Arrow-batched (r14, guide §4): same per-(task, partition)
        append-log semantics and identical record JSON, but rows reach
        Python as columnar RecordBatches (no per-row Row unpickle) and
        each batch's lines land with one writelines per partition.
        Arrival order is preserved: batches arrive in task input order
        and rows are walked in batch order, exactly like the Row
        iterator was."""

        def __init__(self, path: str) -> None:
            self.path = path

        def write(self, iterator):
            import json as _json
            import os as _os
            import uuid as _uuid

            _os.makedirs(self.path, exist_ok=True)
            tid = _uuid.uuid4().hex
            handles: dict = {}
            counts: dict = {}
            dumps = _json.dumps
            for batch in iterator:
                d = batch.to_pydict()
                lines: dict = {}
                for p, k, v in zip(d["partition"], d["key"], d["value"]):
                    n = counts.get(p, 0)
                    counts[p] = n + 1
                    lines.setdefault(p, []).append(
                        dumps({"seq": n, "key": k, "value": v}) + "\n")
                for p, ls in lines.items():
                    if p not in handles:
                        fname = f"segment-p{p:05d}-{tid}.jsonl"
                        handles[p] = (fname, open(
                            _os.path.join(self.path, fname), "w"))
                    handles[p][1].writelines(ls)
            for p, (_, f) in handles.items():
                f.close()
            return _Segments(segments=[(p, fname, counts[p])
                                       for p, (fname, _) in
                                       sorted(handles.items())])

        def commit(self, messages) -> None:
            import json as _json
            import os as _os

            # the broker's per-partition append-log index: segments
            # ordered (deterministically, by filename — cross-producer
            # arrival order is arbitrary, exactly Kafka's contract)
            # with cumulative base offsets; only committed tasks'
            # segments are ever manifested (at-least-once upgrade to
            # exactly-once on read, README.md:119)
            per: dict = {}
            for m in messages:
                if m is None:
                    continue
                for p, fname, n in m.segments:
                    per.setdefault(p, []).append((fname, n))
            ledger: dict = {}
            for p, segs in sorted(per.items()):
                base, out = 0, []
                for fname, n in sorted(segs):
                    out.append({"file": fname, "base_offset": base,
                                "n": n})
                    base += n
                ledger[str(p)] = out
            with open(_os.path.join(self.path, "_LEDGER.json"), "w") as f:
                _json.dump(ledger, f)

        def abort(self, messages) -> None:
            import os as _os

            for m in messages:
                if m is None:
                    continue
                for _, fname, _n in m.segments:
                    try:
                        _os.remove(_os.path.join(self.path, fname))
                    except OSError:
                        pass
except ImportError:  # pragma: no cover - pre-4.0 Spark
    JsonlWriter = None  # type: ignore[assignment]
    KafkaFileWriter = None  # type: ignore[assignment]
