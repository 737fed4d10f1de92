"""Idempotent key-merged serving table (the 'index' sink).

Reference sink: addDocuments-upsert + deleteByQuery + commit per batch
(PaimonRowProcessor.java:242-260; KafkaIngestor.java:251-289). Spark
has no Lucene index; the serving layer is a parquet table that always
holds exactly one live row per key, merged per micro-batch via the
CDC reduce (operators/cdc.py). Merges are idempotent — replaying a
batch after a failed checkpoint converges to the same state, which is
the at-least-once-to-effectively-once upgrade the reference gets from
commit-after-index (KafkaIngestor.java:204-230).

Scale design (100 TB): with ``num_buckets`` set the table is laid out
as hash-bucket partitions (``__bucket = pmod(hash(key), N)``) and a
micro-batch rewrites ONLY the buckets containing changed keys — the
read side partition-prunes to those buckets and the swap moves just
their directories, so per-batch cost is O(touched buckets), not
O(table). ``num_buckets=0`` keeps the simple full rewrite for small
tables.

Commit protocol (both paths): new data is staged to a sibling
directory, then swapped in with the old data kept aside until the new
data is fully in place — the same no-commit-until-complete barrier as
the reference's InFlightBatch (InFlightBatch.java:27-113). A crash
mid-swap never loses committed state: full-rewrite recovery restores
the kept-aside table; bucket-swap recovery first renames back any
bucket caught between its two renames (the kept-aside dir holds that
bucket's ONLY copy — replaying the changelog could not restore keys
absent from it), then the replayed micro-batch converges the rest
(the streaming checkpoint only advances after a successful batch, and
the merge is idempotent — the same redelivery semantics as
PaimonIngestor.java:354-368).

All directory manipulation goes through the Hadoop FileSystem API
(platypus_ingestion_plugins_spark.fs), so ``path`` may be local,
``hdfs://`` or ``s3a://`` (reference parity: S3ALoader.java:32-89).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

from platypus_ingestion_plugins_spark import fs
from platypus_ingestion_plugins_spark.operators.cdc import apply_changelog

BUCKET_COL = "__bucket"

# marker file written into the kept-aside dir by a PARTIAL bucket swap;
# its absence means the kept-aside dir is a full-rewrite's stale copy
SWAP_MARKER = "_PARTIAL_BUCKET_SWAP"


class ServingTable:
    """A queryable, upsertable materialized table at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str | list[str],
        num_buckets: int = 0,
        auto_register_fields: bool = True,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.key = [key] if isinstance(key, str) else list(key)
        self.num_buckets = num_buckets
        # reference parity (IngestionConfig.autoRegisterFields,
        # default FALSE there): with auto-register ON (our default —
        # schema evolution is the lakehouse norm) a batch carrying new
        # columns widens the table; with it OFF the registered sidecar
        # schema is a CONTRACT and an unknown column is an ingest
        # error, caught before any data lands
        self.auto_register_fields = auto_register_fields

    @property
    def _staging(self) -> str:
        return self.path + "__staging"

    @property
    def _old(self) -> str:
        return self.path + "__old"

    def _bucket_col(self) -> Column:
        return F.pmod(F.hash(*[F.col(k) for k in self.key]), F.lit(self.num_buckets))

    def _recover(self) -> None:
        """Repair any interrupted swap before touching the table.

        - table missing but kept-aside copy present -> crash between
          the two renames of a full-rewrite swap: restore the copy.
        - both present, kept-aside dir carries the partial-swap marker
          -> a bucket swap died mid-flight: any ``__bucket=*`` under it
          whose live directory is MISSING was between its two renames,
          and the kept-aside copy is the only copy of that bucket's
          committed rows — rename it back before dropping the rest.
          (Replaying the micro-batch cannot restore keys absent from
          the changelog, so discarding it would lose them for good.)
        - both present, no marker -> a full-rewrite swap completed but
          cleanup didn't: the copy is entirely stale, drop it. (No
          per-bucket restore here: a full rewrite may legitimately
          drop a bucket whose keys were all deleted.)
        - leftover staging is always discarded (never committed).
        """
        if fs.exists(self.spark, self._old):
            if not fs.exists(self.spark, self.path):
                fs._rename_or_raise(self.spark, self._old, self.path)
            else:
                names = fs.list_names(self.spark, self._old)
                if SWAP_MARKER in names:
                    for n in names:
                        if n.startswith(f"{BUCKET_COL}=") and not fs.exists(
                            self.spark, f"{self.path}/{n}"
                        ):
                            fs._rename_or_raise(
                                self.spark, f"{self._old}/{n}", f"{self.path}/{n}"
                            )
                fs.delete(self.spark, self._old)
        fs.delete(self.spark, self._staging)

    def exists(self) -> bool:
        self._recover()
        names = fs.list_names(self.spark, self.path)
        return "_SUCCESS" in names or any(
            n.endswith(".parquet") or n.startswith(f"{BUCKET_COL}=") for n in names
        )

    def _log_commit(self, kind: str, n_rows: int, buckets: list[int] | None) -> None:
        """Append a commit record to the table's `_commits.json` —
        the audit surface Paimon gives via snapshot metadata
        (PaimonIngestor.java:269-276): what committed, how many rows,
        which buckets moved. Kept to the last 1000 entries (the log is
        for operators and idempotence debugging, not lineage). The
        read-modify-write lands via stage-and-rename so a crash
        mid-update never leaves a torn, unparseable log."""
        log_path = f"{self.path}/_commits.json"
        raw = fs.read_text(self.spark, log_path)
        entries = json.loads(raw) if raw else []
        entries.append(
            {
                "commit_id": (entries[-1]["commit_id"] + 1) if entries else 0,
                "kind": kind,
                "n_rows": n_rows,
                "buckets": buckets,
            }
        )
        fs.write_text_atomic(self.spark, log_path, json.dumps(entries[-1000:]))

    def commits(self) -> list[dict]:
        """The commit log (oldest first); empty for a fresh table."""
        raw = fs.read_text(self.spark, f"{self.path}/_commits.json")
        return json.loads(raw) if raw else []

    def _check_registered_fields(self, changelog: DataFrame) -> None:
        """auto_register_fields=False contract: a changelog column
        absent from the registered sidecar schema (ignoring CDC
        bookkeeping columns) is an error, raised BEFORE any merge work
        or data lands — mirroring the reference's refusal to index
        unregistered fields when auto-registration is off."""
        if self.auto_register_fields:
            return
        schema_json = fs.read_text(self.spark, f"{self.path}/_schema.json")
        if schema_json is None:
            return  # first-ever batch REGISTERS the schema
        known = {f.name for f in T.StructType.fromJson(json.loads(schema_json))}
        internal = {BUCKET_COL, "_row_kind", "_seq", "_is_poison", "_snapshot"}
        unknown = sorted(set(changelog.columns) - known - internal)
        if unknown:
            raise ValueError(
                f"auto_register_fields is off and the batch carries "
                f"unregistered column(s) {unknown}; registered schema: "
                f"{sorted(known)}"
            )

    def _write_schema(self, schema: T.StructType, at: str | None = None) -> None:
        """Persist the data schema so a fully-emptied table (every key
        deleted -> zero parquet files) stays readable. ``at`` targets
        the staging dir so a full rewrite swaps in a complete table."""
        data_fields = [f for f in schema.fields if f.name != BUCKET_COL]
        fs.write_text_atomic(
            self.spark,
            f"{at or self.path}/_schema.json",
            json.dumps(T.StructType(data_fields).jsonValue()),
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        # read under the persisted table schema (written on every
        # commit): after add-column evolution, untouched bucket files
        # still carry the OLD footer — an explicit schema makes them
        # read NULL for new columns instead of depending on which
        # footer parquet inference happens to pick. Also keeps a
        # fully-emptied table (zero data files) readable.
        schema_json = fs.read_text(self.spark, f"{self.path}/_schema.json")
        if schema_json is not None:
            data_schema = T.StructType.fromJson(json.loads(schema_json))
            full = data_schema
            if self.num_buckets:
                full = T.StructType(
                    list(data_schema.fields)
                    + [T.StructField(BUCKET_COL, T.IntegerType())]
                )
            try:
                return self.spark.read.schema(full).parquet(self.path)
            except AnalysisException:
                return self.spark.createDataFrame([], data_schema)
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame, _log: bool = True) -> None:
        """Full rewrite via stage-then-swap; the old table is kept
        aside until the new one is in place (crash-recoverable)."""
        self._recover()
        if self.num_buckets:
            (
                df.withColumn(BUCKET_COL, self._bucket_col())
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(self._staging)
            )
        else:
            df.write.mode("overwrite").parquet(self._staging)
        # the swap replaces the whole directory: stage the schema sidecar
        # and carried-over commit log INTO the staging dir, so the
        # directory renamed into place is already complete — a crash
        # right after the swap can't leave a table whose read() falls
        # back to (possibly stale) parquet footer inference or whose
        # commit log vanished
        prev_log = fs.read_text(self.spark, f"{self.path}/_commits.json")
        self._write_schema(df.schema, at=self._staging)
        if prev_log is not None:
            fs.write_text(self.spark, f"{self._staging}/_commits.json", prev_log)
        if fs.exists(self.spark, self.path):
            fs._rename_or_raise(self.spark, self.path, self._old)
        fs._rename_or_raise(self.spark, self._staging, self.path)
        fs.delete(self.spark, self._old)
        if _log:
            self._log_commit("overwrite", -1, None)

    def apply_batch(self, changelog: DataFrame) -> None:
        """Apply one CDC micro-batch: last-wins + merge + commit.

        Bucketed tables rewrite only the hash-bucket partitions whose
        keys appear in the changelog; untouched bucket directories are
        not read, rewritten, or moved.

        On the bucketed (scale) path the commit log's row count rides
        the SAME aggregate action that finds the touched buckets — a
        per-bucket count instead of a distinct — so no dedicated
        ``changelog.count()`` rescans the source per micro-batch. (An
        ``observe()`` metric was tried first and DEADLOCKS when
        apply_batch runs inside ``foreachBatch``: the micro-batch's
        DataFrame belongs to a cloned SparkSession whose listener bus
        never delivers the observation, so ``Observation.get`` blocks
        forever — don't reintroduce it.)"""
        self._check_registered_fields(changelog)
        current = self.read()
        if current is None or not self.num_buckets:
            if current is not None and BUCKET_COL in current.columns:
                current = current.drop(BUCKET_COL)
            merged = apply_changelog(changelog, self.key, target=current)
            self.overwrite(merged, _log=False)
            self._log_commit("batch", changelog.count(), None)
            return

        # buckets touched by this batch (bounded by num_buckets, tiny),
        # and the batch row count off the same single aggregate action
        per_bucket = (
            changelog.groupBy(self._bucket_col().alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        n_rows = sum(r["n"] for r in per_bucket)
        changed = sorted(r["b"] for r in per_bucket)
        if not changed:
            return
        if BUCKET_COL in current.columns:
            target = (
                current.filter(F.col(BUCKET_COL).isin(changed))  # partition-pruned scan
                .drop(BUCKET_COL)
            )
        else:
            target = current  # empty-table fallback (no bucket dirs on disk)
        merged = apply_changelog(changelog, self.key, target=target)
        (
            merged.withColumn(BUCKET_COL, self._bucket_col())
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(self._staging)
        )
        # schema sidecar BEFORE the swap: widening first is safe (old
        # bucket files read NULL for a new column), whereas sidecar-after
        # leaves a crash window where an evolved column is invisible to
        # read() and a later full rewrite would drop it physically
        self._write_schema(merged.schema)
        self._swap_buckets(changed)
        self._log_commit("batch", n_rows, changed)

    def _swap_buckets(self, buckets: list[int]) -> None:
        """Per-bucket swap: old dir aside -> staged dir in -> drop old.

        The marker goes in BEFORE the first rename so _recover can tell
        this kept-aside dir apart from a full rewrite's stale copy and
        restore any bucket caught between its two renames.

        Every rename's boolean result is CHECKED: Hadoop
        FileSystem.rename reports failure by returning false, and
        proceeding past one would delete the staging dir holding the
        only copy of a bucket's merged batch while the commit logs
        success. A raise here leaves marker + staging in place, which
        _recover and a replay handle."""
        fs.delete(self.spark, self._old)
        fs.mkdirs(self.spark, self._old)
        fs.write_text(self.spark, f"{self._old}/{SWAP_MARKER}", "")
        for b in buckets:
            part = f"{BUCKET_COL}={b}"
            live = f"{self.path}/{part}"
            staged = f"{self._staging}/{part}"
            if fs.exists(self.spark, live):
                fs._rename_or_raise(self.spark, live, f"{self._old}/{part}")
            if fs.exists(self.spark, staged):
                fs._rename_or_raise(self.spark, staged, live)
        fs.delete(self.spark, self._old)
        fs.delete(self.spark, self._staging)

    def compact(self, max_files_per_bucket: int = 4) -> list[int]:
        """Small-file compaction: rewrite oversized bucket directories
        down to one parquet file each.

        Every micro-batch write fans a bucket's rows across its shuffle
        tasks, so a hot bucket accumulates up to #tasks files per
        rewrite; query-side scan cost and file-listing latency grow with
        file count, not data size (the classic streaming-sink pathology
        at scale — the reference delegates this to Paimon's own
        compaction). Only buckets whose parquet-file count exceeds
        ``max_files_per_bucket`` are rewritten, through the same
        stage-then-swap barrier as apply_batch, so a crash mid-compaction
        is recoverable and readers never see a partial bucket. Returns
        the bucket ids compacted.

        Unbucketed tables compact to a single file via the full-rewrite
        path when the table directory is oversized.
        """
        if not self.exists():
            return []
        if not self.num_buckets:
            n_files = sum(
                1 for n in fs.list_names(self.spark, self.path) if n.endswith(".parquet")
            )
            if n_files <= max_files_per_bucket:
                return []
            self.overwrite(self.query().coalesce(1))
            return [0]

        oversized = []
        for name in fs.list_names(self.spark, self.path):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            b = int(name.split("=", 1)[1])
            files = fs.list_names(self.spark, f"{self.path}/{name}")
            if sum(1 for f in files if f.endswith(".parquet")) > max_files_per_bucket:
                oversized.append(b)
        if not oversized:
            return []
        # read() pins the persisted sidecar schema: after add-column
        # evolution a bucket holds files with OLD footers, and raw
        # parquet inference picking one would rewrite the bucket
        # without the evolved column — silently destroying its values
        current = self.read()
        # one shuffle partition per bucket -> exactly one output file each
        (
            current.filter(F.col(BUCKET_COL).isin(oversized))
            .repartition(len(oversized), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(self._staging)
        )
        self._swap_buckets(sorted(oversized))
        self._log_commit("compact", -1, sorted(oversized))
        return sorted(oversized)

    def query(self) -> DataFrame:
        df = self.read()
        if df is None:
            raise FileNotFoundError(f"serving table {self.path} does not exist yet")
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return df

    def lookup(self, *key_values) -> DataFrame:
        """Point lookup by key: on a bucketed table the key's bucket is
        computed at plan time, so the scan partition-prunes to ONE
        bucket directory (~1/num_buckets of the files) — the serving
        layer's Q3 term query at its cheapest. Falls back to a plain
        filter on unbucketed tables."""
        if len(key_values) != len(self.key):
            raise ValueError(f"lookup expects {len(self.key)} value(s) for key {self.key}")
        df = self.read()
        if df is None:
            raise FileNotFoundError(f"serving table {self.path} does not exist yet")
        # murmur3 is TYPE-sensitive: hash(5 as int) != hash(5 as bigint),
        # and a bare Python int literal becomes IntegerType while keys
        # written through createDataFrame/parquet are typically LongType.
        # Cast every literal to the table's key column type so both the
        # bucket hash and the equality predicate see the stored type —
        # otherwise the bucket filter prunes to the WRONG directory and
        # the lookup silently returns nothing. Casts of literals fold at
        # plan time, so partition pruning is preserved.
        lits = [
            F.lit(v).cast(df.schema[k].dataType)
            for k, v in zip(self.key, key_values)
        ]
        cond = None
        for k, lit in zip(self.key, lits):
            c = F.col(k) == lit
            cond = c if cond is None else cond & c
        if self.num_buckets and BUCKET_COL in df.columns:
            b = F.pmod(F.hash(*lits), F.lit(self.num_buckets))
            cond = (F.col(BUCKET_COL) == b) & cond
        return df.filter(cond).drop(BUCKET_COL) if BUCKET_COL in df.columns else df.filter(cond)


def update_by_query(
    table: ServingTable,
    predicate: Column,
    assignments: dict[str, Column],
) -> int:
    """Elasticsearch ``_update_by_query`` on the serving table
    (NEW r15): apply column ``assignments`` to every CURRENT row
    matching ``predicate``, routed through the SAME CDC apply path as
    any ingest batch (last-wins merge, bucket-pruned rewrite, commit
    log) — updates are upsert batches, not a second write path, so
    crash recovery, schema checks, and read-your-writes hold without
    new machinery. Returns the number of rows updated.

    Scale shape: one read + filter (bucket/partition pruning applies
    to the predicate like any query), assignments are codegen
    expressions, and ``apply_batch`` rewrites ONLY the touched
    buckets. Assigning a key column is rejected — that is a delete +
    insert, not an update (ES rejects id reassignment in scripts for
    the same reason)."""
    for col in assignments:
        if col in table.key:
            raise ValueError(
                f"update_by_query cannot reassign key column {col!r}; "
                "delete and re-ingest instead"
            )
    cur = table.query()
    matched = cur.filter(predicate)
    upd = matched
    for col, expr in assignments.items():
        upd = upd.withColumn(col, expr)
    changelog = upd.withColumn("_row_kind", F.lit("+U")).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    # the changelog is derived from the very files apply_batch swaps
    # out — pin it (lineage-free) BEFORE the apply, or the commit
    # log's post-swap count re-reads deleted files
    changelog = changelog.localCheckpoint(eager=True)
    n = changelog.count()
    if n:
        table.apply_batch(changelog)
    return n


def delete_by_query(table: ServingTable, predicate: Column) -> int:
    """Elasticsearch ``_delete_by_query``: route matching rows through
    the CDC path as ``-D`` ops (same rationale as update_by_query).
    Returns the number of rows deleted."""
    cur = table.query()
    matched = cur.filter(predicate)
    changelog = matched.withColumn("_row_kind", F.lit("-D")).withColumn(
        "_seq", F.monotonically_increasing_id()
    )
    # same self-reference pin as update_by_query
    changelog = changelog.localCheckpoint(eager=True)
    n = changelog.count()
    if n:
        table.apply_batch(changelog)
    return n


_ALIAS_SIDECAR = "_alias"


def set_alias(
    spark: SparkSession,
    alias_path: str,
    table_path: str,
    filter_dsl: dict | None = None,
) -> None:
    """Index alias (the Elasticsearch aliases API, NEW r15): an
    atomic name -> table-path indirection, the zero-downtime swap
    primitive — rebuild a corpus at a new path, point the alias,
    readers move on their next resolve with no partial state
    (fs.write_text_atomic = temp + rename, the serving table's own
    commit discipline). The target must exist — aliasing a
    nonexistent table is always a deploy bug.

    ``filter_dsl`` makes it a FILTERED alias (ES's per-tenant /
    per-slice view primitive): a ``parse_query`` DSL dict stored WITH
    the indirection; ``read_alias`` applies it on every read, so a
    tenant handed the alias can never see past the filter. The DSL
    compiles eagerly here — a typo'd stored filter must fail at
    set time, not on some future read."""
    import json as _json

    probe = ServingTable(spark, table_path, key="_probe")
    if not probe.exists():
        raise FileNotFoundError(
            f"alias target {table_path} is not a serving table"
        )
    if filter_dsl is not None:
        from platypus_ingestion_plugins_spark.serving.query import parse_query

        parse_query(filter_dsl)  # eager validation
        payload = _json.dumps(
            {"target": table_path, "filter": filter_dsl}, sort_keys=True
        )
    else:
        payload = table_path
    fs.write_text_atomic(
        spark, f"{alias_path.rstrip('/')}/{_ALIAS_SIDECAR}", payload
    )


def _alias_record(spark: SparkSession, alias_path: str) -> dict:
    import json as _json

    raw = fs.read_text(
        spark, f"{alias_path.rstrip('/')}/{_ALIAS_SIDECAR}"
    )
    if not raw:
        raise FileNotFoundError(f"no alias at {alias_path}")
    if raw.lstrip().startswith("{"):
        rec = _json.loads(raw)
        return {"target": rec["target"], "filter": rec.get("filter")}
    return {"target": raw, "filter": None}  # pre-filter plain format


def resolve_alias(spark: SparkSession, alias_path: str) -> str:
    """The table path an alias currently points at; raises on a
    dangling or never-set alias — and on a FILTERED alias: handing
    out the bare target path would let the documented
    resolve-then-read pattern bypass the stored tenant filter; a
    filtered alias is only readable through ``read_alias``."""
    rec = _alias_record(spark, alias_path)
    if rec["filter"] is not None:
        raise ValueError(
            f"{alias_path} is a FILTERED alias — read it through "
            "read_alias(); resolving the bare target would bypass "
            "the stored filter"
        )
    return rec["target"]


def read_alias(
    spark: SparkSession, alias_path: str, key: str | list[str]
) -> DataFrame:
    """Read the serving table behind an alias — the reader-side hop
    clients use so a swap needs no reader redeploy. A FILTERED alias
    applies its stored ``parse_query`` filter on every read."""
    rec = _alias_record(spark, alias_path)
    out = ServingTable(spark, rec["target"], key=key).query()
    if rec["filter"] is not None:
        from platypus_ingestion_plugins_spark.serving.query import parse_query

        out = out.filter(parse_query(rec["filter"]))
    return out
