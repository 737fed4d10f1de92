"""``format("cdc-table")`` sugar over the CDC convention-column layout.

SURVEY §7.3's deferred optional: a Spark Data Source (the Python Data
Source API, Spark 4.x) so the CDC parquet layout (`sources/cdc_table.py`
— ``_snapshot``-partitioned changelog dirs carrying ``_row_kind`` /
``_seq`` convention columns; the Paimon-table equivalent, SURVEY §1.1)
reads with the stock reader surface instead of a library call:

    spark.dataSource.register(CdcTableDataSource)
    df  = spark.read.format("cdc-table").load(path)                  # full log
    inc = (spark.read.format("cdc-table")
           .option("last_snapshot", 3).load(path))                   # splits since ckpt
    st  = spark.readStream.format("cdc-table").load(path)            # snapshot micro-batches

Design notes (Spark-first, not a new engine):
  * ``plain read.parquet + convention columns`` remains the scale
    path — this source is SUGAR, and it keeps the same pruning
    economics: snapshot selection happens at directory-listing time
    (the manifest-level skip the reference gets from Paimon,
    PaimonIngestor.java:248-269), one InputPartition per data file
    (read parallelism = file count, like the native file source), and
    ``read()`` streams pyarrow RecordBatches (Arrow path, no
    row-at-a-time Python).
  * Filter pushdown (Spark 4.1 ``pushFilters``): comparisons on
    ``_snapshot`` are consumed at listing time — every row in a dir
    shares the dir's snapshot id, so a pushed snapshot filter prunes
    whole directories and is NOT re-evaluated by Spark. All other
    filters are returned for Spark to apply post-scan.
  * Streaming uses the full ``DataSourceStreamReader`` (r12 — was
    the driver-prefetching simple reader until VERDICT r11 task #4):
    the offset IS the last consumed snapshot id ({"snapshot": n} —
    exactly the checkpoint the reference persists via
    StreamTableScan.checkpoint), each micro-batch is the set of
    snapshot dirs that appeared since, planned as one InputPartition
    per data file and read as Arrow batches ON EXECUTORS — the same
    parallel read as batch, so the streaming sugar no longer has a
    driver-materializing path and heavy topics are fine through it.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import LongType, StructField, StructType

SNAPSHOT_COL = "_snapshot"
SEQ_COL = "_seq"


def _range_keep(lo, hi, filters) -> bool:
    """Can ANY value in [lo, hi] satisfy the AND of pushed comparisons?
    Conservative: unknown stats (lo/hi None) keep the range. This is
    the standard parquet row-group stats test — pruning only, the
    engine still re-applies the predicate to surviving rows."""
    if lo is None or hi is None:
        return True
    for f in filters:
        if isinstance(f, GreaterThan) and not hi > f.value:
            return False
        if isinstance(f, GreaterThanOrEqual) and not hi >= f.value:
            return False
        if isinstance(f, LessThan) and not lo < f.value:
            return False
        if isinstance(f, LessThanOrEqual) and not lo <= f.value:
            return False
        if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
            return False
        # NB: pyspark's In dataclass field is ``value`` (a tuple of
        # candidates), not ``values`` — verified against pyspark 4.1
        if isinstance(f, In) and not any(lo <= v <= hi for v in f.value):
            return False
    return True


def _split_path(path: str) -> str:
    return path.rstrip("/")


def _cdc_fs(path: str):
    """(pyarrow FileSystem, fs-local path) — local or URI. The same
    resolution the package's other drivers use (export._tar_fs): a
    bare path is LocalFileSystem, ``scheme://...`` routes through
    ``FileSystem.from_uri`` so ``format("cdc-table")`` works against
    object stores too, and every file path handed to executors is
    fs-local and re-resolved THERE from the original load path (r11
    review #5 — the os.listdir layer silently confined the registered
    format to driver-local paths with a raw FileNotFoundError)."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _list_snapshot_dirs(path: str) -> list[tuple[int, str]]:
    """[(snapshot_id, fs-local dir)] sorted by id; metadata-only."""
    import pyarrow.fs as pafs

    fs, inner = _cdc_fs(path)
    out = []
    for info in fs.get_file_info(pafs.FileSelector(inner, recursive=False)):
        name = info.path.rsplit("/", 1)[-1]
        if not info.is_file and name.startswith(f"{SNAPSHOT_COL}="):
            out.append((int(name.split("=", 1)[1]), info.path))
    out.sort()
    return out


def _list_parquet_files(path: str, snap_dir: str) -> list[str]:
    """fs-local parquet paths under an fs-local snapshot dir; ``path``
    is the original load path (carries the filesystem scheme)."""
    import pyarrow.fs as pafs

    fs, _ = _cdc_fs(path)
    return sorted(
        info.path
        for info in fs.get_file_info(pafs.FileSelector(snap_dir, recursive=False))
        if info.is_file and info.path.endswith(".parquet")
    )


def _first_data_file(path: str) -> str:
    for _snap, d in _list_snapshot_dirs(path):
        files = _list_parquet_files(path, d)
        if files:
            return files[0]
    raise FileNotFoundError(
        f"no {SNAPSHOT_COL}=*/ parquet data under {path} — not a "
        "cdc-table layout (write with cdc_table.write_cdc_snapshot)"
    )


def _snapshot_pred(filters) -> "callable":
    """AND of pushed ``_snapshot`` comparisons as a Python predicate
    applied to whole snapshot ids (dir granularity). A single id is
    the degenerate range [snap, snap], so this IS ``_range_keep`` —
    one comparison dispatch, not two copies drifting apart (r11
    review #7; the drift was real — the old copy read the
    nonexistent ``In.values``)."""
    def pred(snap: int) -> bool:
        return _range_keep(snap, snap, filters)

    return pred


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, snapshot: int):
        self.file_path = file_path
        self.snapshot = snapshot


class CdcTableReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = _split_path(options.get("path") or "")
        if not self.path:
            raise ValueError("cdc-table: .load(path) (or option 'path') required")
        last = options.get("last_snapshot")
        self.last_snapshot = int(last) if last is not None else None
        self.schema = schema
        self.pushed: list = []
        self.seq_hints: list = []

    def pushFilters(self, filters):
        # consume _snapshot comparisons (dir-granular: every row in a
        # dir shares the id, so dir-level pruning is EXACT and the
        # filter needs no re-evaluation). _seq comparisons are
        # row-granular, so they go BACK to Spark for post-scan
        # re-application — but they are also retained as PRUNING HINTS:
        # read() skips whole row groups whose parquet min/max stats
        # can't match (VERDICT r10 task #8 — keeps the sugar honest for
        # incremental "_seq > checkpoint" consumers: the same
        # stats-based skip the native parquet reader gives that
        # predicate, at row-group granularity, without claiming
        # exactness the layout can't guarantee).
        comparisons = (GreaterThan, GreaterThanOrEqual, LessThan,
                       LessThanOrEqual, EqualTo, In)
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == (SNAPSHOT_COL,) and isinstance(f, comparisons):
                self.pushed.append(f)
            else:
                if col == (SEQ_COL,) and isinstance(f, comparisons):
                    self.seq_hints.append(f)
                yield f

    def partitions(self):
        pred = _snapshot_pred(self.pushed)
        parts = []
        for snap, d in _list_snapshot_dirs(self.path):
            if self.last_snapshot is not None and snap <= self.last_snapshot:
                continue  # incremental read: splits since the checkpoint
            if not pred(snap):
                continue  # pushed-filter prune, listing time
            for fp in _list_parquet_files(self.path, d):
                parts.append(_FilePartition(fp, snap))
        # zero matching splits is a valid (empty) incremental read
        return parts or [_FilePartition("", -1)]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_partition_batches(
            self.path, self.schema, partition, self.seq_hints
        )


def _read_partition_batches(
    path: str, schema: StructType, partition: _FilePartition, seq_hints
) -> Iterator:
    """Executor-side Arrow read of one data file: pyarrow RecordBatches
    with the constant ``_snapshot`` column attached, row groups whose
    ``_seq`` min/max stats can't match any hint skipped. Shared by the
    batch reader and the stream reader (r12, VERDICT r11 task #4 —
    the streaming path previously materialized rows driver-side via
    the simple-reader protocol; it now plans one InputPartition per
    file and reads HERE, on executors, exactly like batch)."""
    if not partition.file_path:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    # file paths are fs-local; re-resolve the filesystem HERE (this
    # runs on an executor) from the original load path
    fs, _ = _cdc_fs(path)
    with fs.open_input_file(partition.file_path) as fh:
        pf = pq.ParquetFile(fh)
        if seq_hints:
            try:
                seq_idx = pf.schema_arrow.names.index(SEQ_COL)
            except ValueError:
                seq_idx = -1  # no _seq column: nothing to prune on
            keep = []
            for rg in range(pf.metadata.num_row_groups):
                lo = hi = None
                if seq_idx >= 0:
                    st = pf.metadata.row_group(rg).column(seq_idx).statistics
                    if st is not None and st.has_min_max:
                        lo, hi = st.min, st.max
                if _range_keep(lo, hi, seq_hints):
                    keep.append(rg)
            if not keep:
                return
            table = pf.read_row_groups(keep)
        else:
            table = pf.read()
    n = table.num_rows
    cols, fields = [], []
    for f in schema.fields:
        if f.name == SNAPSHOT_COL:
            arr = pa.array([partition.snapshot] * n, type=pa.int64())
        else:
            arr = table.column(f.name)
        cols.append(arr)
        fields.append(f.name)
    yield from pa.table(dict(zip(fields, cols))).to_batches()


class CdcTableStreamReader(DataSourceStreamReader):
    """Offset = {"snapshot": last consumed id} — the reference's
    StreamTableScan.checkpoint as a Structured Streaming offset.

    Full ``DataSourceStreamReader`` (r12, VERDICT r11 task #4): the
    driver only LISTS snapshot dirs (latestOffset + partitions are
    metadata-only), each micro-batch plans one InputPartition per data
    file and ``read()`` streams Arrow batches on EXECUTORS — the same
    parallel read as batch, replacing the SimpleDataSourceStreamReader
    whose protocol prefetches rows driver-side. Offset ranges are
    deterministic on replay because snapshot dirs are append-only."""

    def __init__(self, options, schema: StructType):
        self.path = _split_path(options.get("path") or "")
        if not self.path:
            raise ValueError("cdc-table: .load(path) (or option 'path') required")
        last = options.get("last_snapshot")
        self.start_snapshot = int(last) if last is not None else -1
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"snapshot": self.start_snapshot}

    def latestOffset(self) -> dict:
        snaps = [s for s, _ in _list_snapshot_dirs(self.path)]
        return {"snapshot": max([*snaps, self.start_snapshot])}

    def partitions(self, start: dict, end: dict) -> list:
        lo, hi = start["snapshot"], end["snapshot"]
        parts = []
        for snap, d in _list_snapshot_dirs(self.path):
            if snap <= lo or snap > hi:
                continue
            for fp in _list_parquet_files(self.path, d):
                parts.append(_FilePartition(fp, snap))
        # an empty range is a valid (empty) micro-batch
        return parts or [_FilePartition("", -1)]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_partition_batches(
            self.path, self.schema, partition, ()
        )

    def commit(self, end: dict) -> None:
        pass  # snapshot dirs are append-only; nothing to release


class CdcTableDataSource(DataSource):
    """``spark.dataSource.register(CdcTableDataSource)`` then
    ``format("cdc-table")`` for batch, incremental and streaming reads
    of the convention-column CDC layout."""

    @classmethod
    def name(cls) -> str:
        return "cdc-table"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow.parquet as pq

        path = _split_path(self.options.get("path") or "")
        if not path:
            raise ValueError("cdc-table: .load(path) (or option 'path') required")
        fs, _ = _cdc_fs(path)
        with fs.open_input_file(_first_data_file(path)) as fh:
            file_schema = from_arrow_schema(
                pq.read_schema(fh), prefer_timestamp_ntz=True
            )
        return StructType(
            list(file_schema.fields)
            + [StructField(SNAPSHOT_COL, LongType(), False)]
        )

    def reader(self, schema: StructType) -> CdcTableReader:
        return CdcTableReader(self.options, schema)

    def streamReader(self, schema: StructType) -> CdcTableStreamReader:
        return CdcTableStreamReader(self.options, schema)


def register_cdc_table_source(spark) -> None:
    """Idempotent registration of the ``cdc-table`` format. Also turns
    on ``spark.sql.python.filterPushdown.enabled`` (a runtime conf,
    default false in Spark 4.1): the reader implements ``pushFilters``
    and Spark refuses to plan a pushdown-capable Python source while
    the flag is off."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CdcTableDataSource)
