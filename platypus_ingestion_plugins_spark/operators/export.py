"""Deterministic corpus shuffle + train-shard export.

Training pipelines need the corpus in a pseudo-random order (to
decorrelate batches) that is REPRODUCIBLE — the same data and seed
must yield the same shard files on any engine, partitioning, or rerun.
``df.orderBy(rand(seed))`` fails that: Spark's rand is
partition-layout-dependent. Here the permutation is a pure function of
each row's key: ``u = unit_hash(key, salt)`` (functions/sampling.py —
the md5→[0,1) trick an external SQL engine reproduces bit-for-bit).

One hash drives everything:
- ``shard = floor(u * n_shards)`` — a contiguous range of the hash
  order, so every shard is a uniform sample AND concatenating shards
  0..N-1 replays the full global permutation;
- within-shard position = rank by ``(u, key)``.

100 TB shape: assignment is a codegen projection riding the scan; the
only shuffle is the write's partitionBy(shard) exchange. Within-shard
ranking is one task per shard — shard count is chosen so a shard is
file-sized (hundreds of MB), which bounds that task by construction;
there is no global sort. The reference has no export surface; this is
a §2.7 extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.sampling import unit_hash

ORDER_COL = "__shuffle_u"


def shuffle_assign(
    df: DataFrame, key: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Add ``shard`` (int, 0..n_shards-1) and the ordering hash —
    a pure projection, deterministic in (key, salt)."""
    u = unit_hash(key, salt)
    return df.withColumn(ORDER_COL, u).withColumn(
        "shard", F.floor(F.col(ORDER_COL) * n_shards).cast("int")
    )


def shuffle_positions(
    df: DataFrame, key: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """(key, shard, pos): the materialized permutation — pos is the
    0-based rank within the shard by (hash, key). One task per shard;
    size n_shards for file-sized shards (see module doc)."""
    w = Window.partitionBy("shard").orderBy(ORDER_COL, key)
    return (
        shuffle_assign(df, key, n_shards, salt)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop(ORDER_COL)
    )


def pack_bins(
    df: DataFrame,
    key: str,
    n_tokens_col: str,
    target_tokens: int,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents laid out in
    the deterministic shuffle order form one token stream per shard,
    chunked into context windows of ``target_tokens``. Each document
    gets ``offset`` (its exclusive token-cumsum position in the shard
    stream) and ``bin = floor(offset / target_tokens)`` — the window
    its first token lands in. Documents may span bins, the standard
    pre-training packing (no padding waste, no bin-packing heuristics,
    and — unlike first-fit — fully order-deterministic, so an external
    engine reproduces the exact layout).

    The cumulative sum is one window per shard (ROWS frame, explicit —
    RANGE-with-ties would diverge from the SQL oracle), bounded by the
    same file-sized-shard sizing as shuffle_positions."""
    w = (
        Window.partitionBy("shard")
        .orderBy(ORDER_COL, key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        shuffle_assign(df, key, n_shards, salt)
        .withColumn(
            "offset",
            (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)).cast("long"),
        )
        .withColumn(
            "bin", F.floor(F.col("offset") / target_tokens).cast("long")
        )
        .drop(ORDER_COL)
    )


def materialize_packs(
    df: DataFrame,
    key: str,
    text_col: str,
    n_tokens_col: str,
    target_tokens: int,
    n_shards: int,
    salt: str = "shuffle",
    sep: str = " ",
) -> DataFrame:
    """Build the packed training rows: per (shard, bin), documents
    concatenated in stream order. A document belongs to the bin its
    FIRST token lands in, so packs are variable-length around
    ``target_tokens`` (the chunk grid, not a hard cap) — the padding-
    free trade the concatenate-then-chunk scheme makes.

    Order inside a pack is made deterministic without a sort exchange:
    ``collect_list`` order is partition-dependent, so each element
    carries its offset and ``array_sort`` restores stream order after
    the aggregation. One groupBy on (shard, bin) — map-side partials,
    pack sizes bounded by construction (~target_tokens of text)."""
    packed = pack_bins(df, key, n_tokens_col, target_tokens, n_shards, salt)
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("offset"), F.col(text_col)))
            ).alias("__parts"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens_col).alias("n_tokens"),
        )
        .select(
            "shard",
            "bin",
            "n_docs",
            "n_tokens",
            F.array_join(
                F.transform("__parts", lambda s: s[text_col]), sep
            ).alias("pack_text"),
        )
    )


def export_shuffled(
    df: DataFrame,
    out_path: str,
    key: str,
    n_shards: int,
    salt: str = "shuffle",
    max_records_per_file: int | None = None,
) -> None:
    """Write the shuffled corpus as ``out_path/shard=K/*.parquet``,
    rows within each shard file in permutation order.

    ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` puts
    each shard's rows in ONE task in hash order, so each shard
    directory holds ordered files; ``maxRecordsPerFile`` caps file
    size without disturbing the order (Spark splits the sorted stream
    sequentially). Readers that list shard dirs and files in name
    order replay the deterministic permutation.
    """
    out = shuffle_assign(df, key, n_shards, salt).repartition(
        n_shards, F.col("shard")
    ).sortWithinPartitions("shard", ORDER_COL, key)
    writer = out.drop(ORDER_COL).write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)


def export_jsonl_shards(
    df: DataFrame,
    out_path: str,
    key: str,
    n_shards: int,
    salt: str = "shuffle",
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """Write the corpus as JSONL shards — the lingua-franca LLM data
    drop (``out_path/shard=K/*.json[.gz]``, one JSON object per line,
    rows within each shard in the deterministic permutation order).
    Same layout contract as ``export_shuffled``: shard = a contiguous
    range of the hash order (so concatenating shard dirs in name order
    replays the global permutation) and ``maxRecordsPerFile`` splits
    the sorted stream sequentially, preserving order. Serialization is
    JVM-side ``to_json`` over the full row struct — no Python in the
    path; gzip (default) trades CPU for the ~5-10× text shrink a
    100 TB JSONL drop needs in transit."""
    cols = [c for c in df.columns]
    out = (
        shuffle_assign(df, key, n_shards, salt)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", ORDER_COL, key)
        .select(
            "shard",
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
        )
    )
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        writer = writer.option("compression", compression)
    writer.text(out_path)


def read_jsonl_shards(spark, path: str, schema) -> DataFrame:
    """Typed read-back of an ``export_jsonl_shards`` layout: the text
    source decompresses transparently, ``from_json`` restores the
    declared schema JVM-side. Shard dirs remain individually
    addressable (``.../shard=3``) for per-shard loaders."""
    return (
        spark.read.text(f"{path}/shard=*/")
        .select(F.from_json("value", schema).alias("r"))
        .select("r.*")
    )


def _tar_fs(path: str):
    """(pyarrow FileSystem, fs-local path) — local or URI."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _heartbeat_due(
    move_i: int, elapsed_since_touch_s: float, stale_after_s: float
) -> bool:
    """Sentinel re-touch policy for the swap loop: every 256 shard
    moves AND whenever stale_after_s/4 has elapsed since the last
    touch — a <256-shard export (or one stalled inside a single slow
    move) must still refresh its sentinel mtime, else a concurrent
    export's pass-1 sweep can clear a LIVE racer's crash protection
    after stale_after_s (r12 advice #2)."""
    return (move_i > 0 and move_i % 256 == 0) or (
        elapsed_since_touch_s >= max(1.0, stale_after_s / 4.0)
    )


def export_tar_shards(
    df: DataFrame,
    out_path: str,
    key: str,
    content_cols: dict[str, str],
    n_shards: int,
    salt: str = "shuffle",
    stale_after_s: int = 3600,
    _preserve: dict | None = None,
) -> list:
    """Write the corpus as WebDataset-style tar shards —
    ``out_path/shard-00000.tar`` .. — the sequential-read layout
    multimodal training loaders stream (one tar per shard; each sample
    is the group of entries sharing a basename: ``{key}.{ext}`` per
    ``content_cols`` entry, e.g. ``{"text": "txt", "payload": "bin"}``;
    string columns land utf-8, binary columns land raw).

    Scale shape: the deterministic shuffle assigns (shard, order) as a
    codegen projection; ``repartition(n_shards, shard)`` +
    ``sortWithinPartitions`` is the ONE exchange, putting each shard's
    rows through a single task in permutation order; the task streams
    its tar straight to the filesystem (no in-memory tar, no driver
    data). Pick ``n_shards`` so a shard is loader-sized (hundreds of
    MB–1 GB) — shard count IS the read parallelism, the WebDataset
    contract. Tar bytes are deterministic (USTAR, zero mtime/uid/gid,
    fixed mode), so reruns produce byte-identical shards and the
    manifest sha256 is stable.

    Runs eagerly (a lazy return re-minting tars per action would be a
    correctness trap) and returns the manifest rows
    (shard, path, n_samples, n_bytes, sha256), one per shard.

    Output-dir hygiene (overwrite semantics, stage-then-swap,
    ADVICE r9): tasks stream their tars into a GENERATION-SUFFIXED
    staging dir ``out_path/.tar_staging-<uuid>`` — two exports racing
    on the same out_path can no longer delete each other's staging
    mid-write (the old fixed ``.tar_staging`` name made the second
    run clobber the first's as "stale"). Only after the job succeeds
    does the driver swap: raise a ``.swap_in_progress`` sentinel, drop
    the previous generation's ``_manifest.json`` commit marker, move
    the staged tars to their final names, delete any leftover
    ``shard-*.tar`` from a previous wider/failed run plus its own
    staging dir and any FOREIGN staging dir idle for >= 1 h (a
    crashed run's orphan; a younger one may belong to a live
    concurrent export and is left alone), then write a fresh
    ``_manifest.json`` listing every shard with its sha256 and drop
    the sentinel. The marker is the COMMIT record and the sentinel the
    in-progress flag: marker present = complete generation; sentinel
    present = crash-interrupted swap (mixed generations possible);
    neither = hand-assembled/pre-marker directory —
    ``read_tar_shards`` enforces exactly that. This gives the sibling exporters'
    ``mode("overwrite")`` behavior WITHOUT deleting the destination up
    front — so an in-place reshard
    (``export_tar_shards(read_tar_shards(spark, p, ...), p, ...)``)
    reads the old generation intact while writing the new one (a
    pre-job delete would destroy the lazily-read source). A crash
    during the final swap can mix generations in the directory; the
    missing marker flags it, and rerunning the export converges. Run
    with ``spark.speculation=false`` (the repo session default) — a
    speculative duplicate attempt would race the original on the same
    staged tar path.

    ``stale_after_s`` (default 1 h) is the liveness horizon for
    sweeping FOREIGN artifacts (sentinels, staging dirs, marker
    temps): it must exceed the worst-case SWAP duration on the target
    store, not the whole export (the sentinel rises after the write
    action, and this export re-touches its own sentinel every 256
    shard moves as a heartbeat, so a slow-but-live swap presents a
    young mtime to concurrent sweepers — r11 review #4). If a racer
    with a shorter horizon sweeps this export's sentinel anyway, the
    final sentinel drop tolerates the loss with a warning rather than
    failing a committed export.

    ``_preserve`` (internal — ``scrub_tar_shards`` is the public
    face) maps previous-generation shard file names to their manifest
    entries: those tars are left in place untouched, survive the
    leftover sweep, and their entries merge into the fresh commit
    marker — the partial-rewrite contract, where only the shards a
    deletion touches are re-written and re-hashed.
    """
    exts = dict(content_cols)
    if len(set(exts.values())) != len(exts):
        # two columns sharing an extension would write colliding
        # {key}.{ext} member names inside the tar (last write wins
        # silently) AND break the scrub path's ext->column inversion
        # (r12 review #2) — refuse at export time
        raise ValueError(
            f"content_cols extensions must be unique, got {exts}"
        )
    str_cols = {
        c for c, f in dict(df.dtypes).items() if c in exts and f == "string"
    }
    import pyarrow.fs as _pafs

    _drv_fs, _drv_inner = _tar_fs(out_path)
    _info = _drv_fs.get_file_info(_drv_inner)
    if _info.type == _pafs.FileType.File:
        raise ValueError(f"out_path is a regular file, not a directory: {out_path}")
    import uuid as _uuid

    generation = _uuid.uuid4().hex[:12]
    staging_name = f".tar_staging-{generation}"
    _staging = f"{_drv_inner}/{staging_name}"
    _drv_fs.create_dir(_staging, recursive=True)
    assigned = (
        shuffle_assign(df, key, n_shards, salt)
        .select(F.col(key).cast("string").alias("__k"), "shard", ORDER_COL,
                *exts.keys())
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", ORDER_COL, "__k")
        .drop(ORDER_COL)
    )
    out_schema = (
        "shard int, path string, n_samples long, n_bytes long, sha256 string"
    )

    def write_shards(batches):
        import hashlib
        import io as _io
        import tarfile

        import pandas as pd

        fs, inner = _tar_fs(out_path)
        fs.create_dir(f"{inner}/{staging_name}", recursive=True)

        state: dict = {}  # open shard -> (tee, tar, counters)

        class _Tee:
            """File-like that forwards writes to the fs stream while
            hashing and counting — manifest sha/bytes without
            buffering the tar."""

            def __init__(self, raw):
                self.raw, self.h, self.n = raw, hashlib.sha256(), 0

            def write(self, b):
                self.raw.write(b)
                self.h.update(b)
                self.n += len(b)
                return len(b)

            def tell(self):  # tarfile tracks member offsets
                return self.n

            def close(self):
                self.raw.close()

        def close_current():
            if not state:
                return None
            tar, tee, shard, n_samples = (
                state.pop("tar"), state.pop("tee"),
                state.pop("shard"), state.pop("n"),
            )
            tar.close()
            tee.close()
            return (shard, f"{out_path}/shard-{shard:05d}.tar",
                    n_samples, tee.n, tee.h.hexdigest())

        manifest = []
        content = list(exts.items())  # (col, ext) in declared order
        for pdf in batches:
            # explicit column zip: itertuples would positional-rename
            # the dunder "__k" column
            for shard, k, *vals in zip(
                pdf["shard"], pdf["__k"], *[pdf[c] for c, _ in content]
            ):
                shard = int(shard)
                if state.get("shard") != shard:
                    done = close_current()
                    if done:
                        manifest.append(done)
                    tee = _Tee(
                        fs.open_output_stream(
                            f"{inner}/{staging_name}/shard-{shard:05d}.tar"
                        )
                    )
                    state.update(
                        shard=shard, tee=tee, n=0,
                        tar=tarfile.open(
                            fileobj=tee, mode="w",
                            format=tarfile.USTAR_FORMAT,
                        ),
                    )
                for (col, ext), v in zip(content, vals):
                    data = (
                        (v or "").encode("utf-8")
                        if col in str_cols
                        else bytes(v or b"")
                    )
                    info = tarfile.TarInfo(name=f"{k}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.mode = 0o644
                    info.uid = info.gid = 0
                    state["tar"].addfile(info, _io.BytesIO(data))
                state["n"] += 1
        done = close_current()
        if done:
            manifest.append(done)
        if manifest:
            yield pd.DataFrame(
                manifest,
                columns=["shard", "path", "n_samples", "n_bytes", "sha256"],
            )

    # eager: one action executes every write exactly once
    manifest = assigned.mapInPandas(write_shards, out_schema).collect()
    # swap: raise the in-progress sentinel and retract the old
    # generation's commit marker FIRST — a crash from here until the
    # new marker lands leaves the sentinel behind, which readers
    # refuse (a crash-interrupted swap is DETECTABLE, never silently
    # read as a hand-assembled directory; code-review r10 #1) — then
    # move staged tars to their final names and clear the previous
    # generation's leftovers (wider reshards, failed runs)
    marker = f"{_drv_inner}/_manifest.json"
    # the sentinel is GENERATION-SUFFIXED (r11 review #1): a single
    # shared path let the faster of two concurrent exports delete the
    # slower one's in-flight crash protection (then the slower one's
    # own delete raised). Each export raises and drops only its own;
    # readers refuse on ANY sentinel present.
    sentinel_base = f".swap_in_progress-{generation}"
    sentinel = f"{_drv_inner}/{sentinel_base}"
    with _drv_fs.open_output_stream(sentinel) as out:
        out.write(generation.encode("utf-8"))
    prev_marker = f"{_drv_inner}/.manifest_prev-{generation}"
    if _drv_fs.get_file_info(marker).type != _pafs.FileType.NotFound:
        # RENAME, don't delete (r11 review 2nd pass #3): a crash in
        # the swap window used to destroy the only copy of the
        # committed manifest — fatal for scrub_tar_shards, whose
        # SOURCE is this export (an export rerun regenerates; a scrub
        # cannot). The previous marker survives as .manifest_prev-<gen>
        # until the new one lands; scrub auto-restores it on the next
        # attempt after a crash.
        _drv_fs.move(marker, prev_marker)
    new_names = set() if _preserve is None else set(_preserve)
    import time as _time

    _hb_last = _time.monotonic()
    for i, m in enumerate(manifest):
        if _heartbeat_due(i, _time.monotonic() - _hb_last, stale_after_s):
            # heartbeat: a many-thousand-shard swap on an object
            # store can outlive a racer's staleness horizon; a fresh
            # sentinel mtime tells concurrent sweepers this swap is
            # live (r11 review #4; r12: elapsed-time trigger too)
            with _drv_fs.open_output_stream(sentinel) as out:
                out.write(generation.encode("utf-8"))
            _hb_last = _time.monotonic()
        name = f"shard-{m.shard:05d}.tar"
        new_names.add(name)
        final = f"{_drv_inner}/{name}"
        if _drv_fs.get_file_info(final).type != _pafs.FileType.NotFound:
            _drv_fs.delete_file(final)
        _drv_fs.move(f"{_staging}/{name}", final)
    import datetime as _dt

    entries = list(
        _drv_fs.get_file_info(_pafs.FileSelector(_drv_inner, recursive=False))
    )
    now = _dt.datetime.now(_dt.timezone.utc)

    def _stale(info) -> bool:
        t = info.mtime
        return t is not None and (
            (now - t.astimezone(_dt.timezone.utc)).total_seconds()
            > stale_after_s
        )

    # pass 1 — sentinels. A foreign sentinel marks an export inside
    # its swap/commit window: young -> a live racer, keep (dropping it
    # on success is its own job); stale -> a crashed export's
    # permanent reader-blocker, clear it so the CURRENT
    # about-to-commit generation becomes readable (the bare unsuffixed
    # name is the pre-r11 layout's). ``raised`` then reflects the
    # post-sweep sentinel set for pass 2's liveness checks.
    raised = set()
    for info in entries:
        base = info.path.rsplit("/", 1)[-1]
        if not (info.is_file and base.startswith(".swap_in_progress")):
            continue
        if base != sentinel_base and _stale(info):
            _drv_fs.delete_file(info.path)
        else:
            raised.add(base)
    # pass 2 — everything else
    for info in entries:
        base = info.path.rsplit("/", 1)[-1]
        if info.is_file and base.startswith("shard-") and base.endswith(
            ".tar"
        ) and base not in new_names:
            _drv_fs.delete_file(info.path)
        elif info.is_file and base.startswith(".manifest-") and base.endswith(
            ".tmp"
        ):
            # orphan marker temp from a crash mid-commit (r10 #10) —
            # but ONLY if its generation's sentinel is down: a raised
            # sentinel means that export is between swap-start and
            # commit-end and will move this temp momentarily
            # (r11 review #2)
            gen = base[len(".manifest-"):-len(".tmp")]
            if f".swap_in_progress-{gen}" not in raised:
                _drv_fs.delete_file(info.path)
        elif info.is_file and base.startswith(".manifest_prev-"):
            # a crashed swap's recovery copy: keep while its
            # generation's sentinel is up (scrub auto-restore needs
            # it) or while young; sweep once stale and sentinel-down
            # (its generation either committed — owner normally
            # deletes it — or was superseded by this very run's
            # about-to-land marker)
            gen = base[len(".manifest_prev-"):]
            if f".swap_in_progress-{gen}" not in raised and _stale(info):
                _drv_fs.delete_file(info.path)
        elif not info.is_file and base.startswith(".tar_staging"):
            if base == staging_name:
                _drv_fs.delete_dir(info.path)  # our own, fully drained
            else:
                # another generation's staging: an orphan from a crash
                # OR a concurrent export still writing (r10 #2 — the
                # old unconditional delete destroyed the racer's
                # staged tars mid-write). Sweep only when it is
                # plausibly dead: untouched for >= 1 h by its own
                # files' mtimes; unknown mtimes leave it for the next
                # run rather than risk a live racer's data. ONE
                # listing serves both the age check and the
                # empty-husk check (r11 review #8).
                inner_infos = list(
                    _drv_fs.get_file_info(
                        _pafs.FileSelector(info.path, recursive=False)
                    )
                )
                stamps = [
                    fi.mtime for fi in inner_infos if fi.mtime is not None
                ]
                if stamps and all(
                    (now - t.astimezone(_dt.timezone.utc)).total_seconds()
                    > stale_after_s
                    for t in stamps
                ):
                    _drv_fs.delete_dir(info.path)
                elif not inner_infos:
                    _drv_fs.delete_dir(info.path)  # empty husk
    # commit: the marker exists IFF the swap completed; staged through
    # a temp name so readers never see a partial marker, then the
    # sentinel drops — its absence certifies the swap ran to the end
    import json as _json

    marker_tmp = f"{_drv_inner}/.manifest-{generation}.tmp"
    entries = [
        {"shard": int(m.shard),
         "name": f"shard-{m.shard:05d}.tar",
         "n_samples": int(m.n_samples),
         "n_bytes": int(m.n_bytes),
         "sha256": m.sha256}
        for m in manifest
    ]
    if _preserve:
        entries.extend(_preserve.values())
        entries.sort(key=lambda e: e["shard"])
    with _drv_fs.open_output_stream(marker_tmp) as out:
        out.write(_json.dumps({
            "generation": generation,
            "n_shards": len(entries),
            # shard_space is the SHUFFLE width (an empty shard has no
            # entry, so len(entries) can undercount it) — the scrub
            # path re-derives shard assignment from this
            "shard_space": int(n_shards),
            "shards": entries,
        }).encode("utf-8"))
    _drv_fs.move(marker_tmp, marker)
    try:
        _drv_fs.delete_file(prev_marker)
    except FileNotFoundError:
        pass  # no previous generation, or a sweeper got it
    try:
        _drv_fs.delete_file(sentinel)
    except FileNotFoundError:
        # a racer with a shorter staleness horizon swept our sentinel
        # mid-swap (r11 review #4). The commit marker just landed, so
        # THIS export's data is consistent — failing here would junk a
        # completed job — but readers lost crash protection for part
        # of the swap window; surface it.
        import warnings

        warnings.warn(
            f"swap sentinel {sentinel} was removed by a concurrent "
            "export before this one finished its swap; the commit "
            "marker is in place and this generation is consistent, "
            "but raise stale_after_s above the worst-case swap "
            "duration to keep the in-progress flag visible",
            RuntimeWarning,
            stacklevel=2,
        )
    return manifest


def read_tar_shards(
    spark,
    path: str,
    content_cols: dict[str, str],
    key_name: str = "key",
    binary_cols: tuple[str, ...] = (),
    shards: list[int] | None = None,
) -> DataFrame:
    """Stream WebDataset-style tar shards back to rows: one task per
    tar (shard count = read parallelism, the format's contract), each
    task reading its tar SEQUENTIALLY in streaming mode (``r|`` — no
    seeks, no whole-file buffering, object-store friendly). Entries
    sharing a basename stem form one sample; ``content_cols`` maps
    extension -> output column (decoded utf-8 unless the column is in
    ``binary_cols``). Listing is driver-side metadata only.

    When the directory carries an ``export_tar_shards`` commit marker
    (``_manifest.json``), the marker IS the shard list: a tar it names
    that is missing raises (a crash-interrupted swap — rerun the
    export to converge), and tars it does not name (a previous wider
    generation's leftovers) are ignored instead of silently mixed in.
    A ``.swap_in_progress`` sentinel (raised before the swap's first
    destructive step, dropped after the new marker lands) also raises:
    a marker-less dir WITH the sentinel is a crash-interrupted swap
    holding mixed generations, not a hand-assembled shard set —
    without the sentinel the two were indistinguishable and the
    fallback read mixed data silently (code-review r10 #1). Only
    sentinel-less, marker-less directories (hand-assembled shard
    sets, pre-marker exports) fall back to listing every ``*.tar``.

    ``shards`` restricts the read to those shard ids (marker-backed
    directories only — the subset is meaningful only against a
    committed shard list): the scrub path reads JUST the shards a
    deletion touches instead of the whole export."""
    import json as _json

    import pyarrow.fs as pafs

    fs, inner = _tar_fs(path)
    cols = dict(content_cols)
    fields = ", ".join(
        [f"{key_name} string"]
        + [
            f"{c} {'binary' if c in binary_cols else 'string'}"
            for c in cols.values()
        ]
    )
    listing = list(fs.get_file_info(pafs.FileSelector(inner, recursive=False)))
    sentinels = [
        i.path
        for i in listing
        if i.is_file
        and i.path.rsplit("/", 1)[-1].startswith(".swap_in_progress")
    ]
    if sentinels:
        # generation-suffixed since r11 (one per in-flight export); the
        # bare name is the pre-r11 layout — ANY of them means a swap is
        # in flight or crashed mid-way and the dir may mix generations
        raise FileNotFoundError(
            f"{path} has a swap-in-progress sentinel "
            f"({sentinels[0].rsplit('/', 1)[-1]}): an export swap is "
            "in flight or crashed mid-way and the directory may mix "
            "generations — rerun the export to converge (interrupted swap)"
        )
    marker_info = fs.get_file_info(f"{inner}/_manifest.json")
    if marker_info.type == pafs.FileType.File:
        with fs.open_input_stream(f"{inner}/_manifest.json") as fh:
            committed = _json.loads(fh.read().decode("utf-8"))
        tars = []
        want = None if shards is None else {int(s) for s in shards}
        for entry in sorted(committed["shards"], key=lambda e: e["shard"]):
            if want is not None and int(entry["shard"]) not in want:
                continue
            tar_path = f"{inner}/{entry['name']}"
            if fs.get_file_info(tar_path).type != pafs.FileType.File:
                raise FileNotFoundError(
                    f"commit marker names {entry['name']} but it is missing "
                    f"from {path} — interrupted swap; rerun the export"
                )
            tars.append(tar_path)
    else:
        if shards is not None:
            raise ValueError(
                "shards= subset read requires a commit marker "
                "(_manifest.json); this directory has none"
            )
        tars = sorted(
            i.path for i in listing if i.is_file and i.path.endswith(".tar")
        )
    if not tars:
        return spark.createDataFrame([], fields)
    paths_df = spark.createDataFrame([(p,) for p in tars], "p string").repartition(
        max(len(tars), 1)
    )

    def parse(batches):
        import tarfile

        import pandas as pd

        fs2, _ = _tar_fs(path)
        for pdf in batches:
            for p in pdf["p"]:
                rows: dict[str, dict] = {}
                order: list[str] = []
                with fs2.open_input_stream(p) as stream:
                    with tarfile.open(fileobj=stream, mode="r|") as tar:
                        for m in tar:
                            stem, _, ext = m.name.rpartition(".")
                            if ext not in cols:
                                continue
                            data = tar.extractfile(m).read()
                            if stem not in rows:
                                rows[stem] = {}
                                order.append(stem)
                            col = cols[ext]
                            rows[stem][col] = (
                                data if col in binary_cols
                                else data.decode("utf-8")
                            )
                if rows:
                    yield pd.DataFrame(
                        {
                            key_name: order,
                            **{
                                c: [rows[s].get(c) for s in order]
                                for c in cols.values()
                            },
                        }
                    )

    return paths_df.mapInPandas(parse, fields)


def scrub_tar_shards(
    spark,
    path: str,
    content_cols: dict[str, str],
    ids: list,
    salt: str = "shuffle",
    binary_cols: tuple[str, ...] = (),
) -> dict:
    """Targeted deletion from a committed tar export — the
    right-to-be-forgotten path: remove the samples whose keys are in
    ``ids`` by REWRITING ONLY THE SHARDS THEY LIVE IN, leaving every
    other shard byte-identical (sha unchanged in the merged manifest).

    Why this is O(touched), not O(corpus): shard assignment is the
    deterministic ``shuffle_assign`` hash of the key, so the affected
    shard set is computed from the deletion list alone (one
    list-sized Spark projection — the SAME expression the export ran,
    never a re-derivation that could drift); only those tars are read
    back (``read_tar_shards(shards=...)``), filtered, and re-exported
    through the standard stage-then-swap machinery with the untouched
    shards' manifest entries carried forward (``_preserve``). A
    deletion of k keys touches at most k shards no matter how many
    thousand the export holds. A shard whose every sample is deleted
    disappears from directory and manifest both.

    ``content_cols`` is the EXPORT mapping (column -> extension), the
    same dict the original export was written with; keys compare as
    their string form (the tar member basename). Requires a commit
    marker — scrubbing an uncommitted/hand-assembled directory has no
    authoritative shard list to preserve. Returns
    {"affected_shards": [...], "rewritten": n, "dropped_shards":
    [...], "n_deleted": k_found}.
    """
    import json as _json

    import pyarrow.fs as pafs
    from pyspark.sql import functions as F

    for i in ids:
        # str(True) == 'True' but Spark casts booleans to 'true';
        # doubles render '1.0E-7' vs Python's '1e-07' — any such
        # drift silently deletes NOTHING, the worst failure mode a
        # forget-me path can have (r11 review 3rd pass #2). int/str
        # render identically in both engines; everything else is
        # refused loudly — and BEFORE any marker/recovery work, so a
        # bad argument can never be mistaken for directory state.
        if isinstance(i, bool) or not isinstance(i, (int, str)):
            raise TypeError(
                f"scrub ids must be int or str (got {type(i).__name__}"
                f" for {i!r}): other types stringify differently in "
                "Python and Spark, so the deletion would silently "
                "miss — pass the key's tar-basename string form"
            )
    fs, inner = _tar_fs(path)
    marker_path = f"{inner}/_manifest.json"
    if fs.get_file_info(marker_path).type != pafs.FileType.File:
        # crash-recovery: a scrub (or export) that died mid-swap left
        # the previous committed manifest parked as .manifest_prev-*
        # (r11 review 2nd pass #3). Exactly one park -> restore it and
        # clear the dead swap's sentinel; rerunning the same scrub
        # then converges (deterministic bytes, deletes idempotent).
        listing = list(
            fs.get_file_info(pafs.FileSelector(inner, recursive=False))
        )
        parks = [
            i.path
            for i in listing
            if i.is_file
            and i.path.rsplit("/", 1)[-1].startswith(".manifest_prev-")
        ]
        if len(parks) == 1:
            import hashlib
            import warnings

            gen = parks[0].rsplit("/", 1)[-1][len(".manifest_prev-"):]
            # VERIFY before adopting (r11 review 3rd pass #1): the
            # park may come from a crashed RE-EXPORT, not a crashed
            # scrub — then some shards already hold the next
            # generation's bytes and certifying the old manifest over
            # them would commit a silently-mixed corpus. The shards
            # THIS deletion will rewrite anyway may legitimately
            # mismatch (a crashed identical scrub); any OTHER
            # mismatch aborts. Recovery-path-only cost: one sha pass
            # over the export.
            with fs.open_input_stream(parks[0]) as fh:
                parked = _json.loads(fh.read().decode("utf-8"))
            to_rewrite = set()
            if "shard_space" in parked:
                sp = int(parked["shard_space"])
                tmp_ids = spark.createDataFrame(
                    [(str(i),) for i in ids], "__k string"
                )
                to_rewrite = {
                    r.shard
                    for r in shuffle_assign(tmp_ids, "__k", sp, salt)
                    .select("shard")
                    .distinct()
                    .collect()
                }
            for e in parked.get("shards", []):
                if int(e["shard"]) in to_rewrite:
                    continue
                fpath = f"{inner}/{e['name']}"
                h = hashlib.sha256()
                with fs.open_input_stream(fpath) as fh:
                    while True:
                        b = fh.read(1 << 20)
                        if not b:
                            break
                        h.update(bytes(b))
                if h.hexdigest() != e["sha256"]:
                    raise RuntimeError(
                        f"{path}: crash-parked manifest (gen {gen}) "
                        f"does not match disk for {e['name']} — the "
                        "interrupted writer was a re-export, not a "
                        "scrub, and the directory mixes generations; "
                        "rerun that export to converge before "
                        "scrubbing"
                    )
            fs.move(parks[0], marker_path)
            sent = f"{inner}/.swap_in_progress-{gen}"
            if fs.get_file_info(sent).type == pafs.FileType.File:
                fs.delete_file(sent)
            warnings.warn(
                f"restored {path}/_manifest.json from a crash-parked "
                "previous generation (disk verified for every shard "
                "outside this deletion's own rewrite set); this scrub "
                "re-converges the rest",
                RuntimeWarning,
                stacklevel=2,
            )
        else:
            raise FileNotFoundError(
                f"{path} has no commit marker (_manifest.json) and "
                f"{len(parks)} crash-parked manifests; scrub requires "
                "a committed export"
            )
    with fs.open_input_stream(marker_path) as fh:
        committed = _json.loads(fh.read().decode("utf-8"))
    entries = {int(e["shard"]): e for e in committed["shards"]}
    if "shard_space" not in committed:
        # guessing the width from max(shard)+1 is WRONG whenever the
        # original export's top shard(s) happened to be empty — the
        # deletion ids would be assigned with a different modulus,
        # silently missing their real shards (r11 review 2nd pass #1)
        raise ValueError(
            f"{path}/_manifest.json lacks shard_space (pre-r11 "
            "marker); re-export once with this version before "
            "scrubbing — the shuffle width cannot be inferred safely"
        )
    shard_space = int(committed["shard_space"])
    id_strs = [str(i) for i in ids]
    ids_df = spark.createDataFrame([(s,) for s in id_strs], "__k string")
    affected = sorted(
        r.shard
        for r in shuffle_assign(ids_df, "__k", shard_space, salt)
        .select("shard")
        .distinct()
        .collect()
    )
    touched = [s for s in affected if s in entries]
    if not touched:
        return {"affected_shards": [], "rewritten": 0,
                "dropped_shards": [], "n_deleted": 0}
    read_map = {ext: col for col, ext in dict(content_cols).items()}
    back = read_tar_shards(
        spark, path, read_map, key_name="__k",
        binary_cols=binary_cols, shards=touched,
    ).persist()
    try:
        # gate on ACTUAL hits before rewriting: a stale deletion list
        # (ids already scrubbed, or never present) used to re-read,
        # re-hash and re-swap the hash-target shards on every run —
        # O(shard) I/O and a needless crash window per phantom id
        # (r11 review 3rd pass #4). The persist means the hit count
        # and the rewrite share one physical read. Membership is a
        # broadcast semi/anti join against the ids frame, not an
        # isin() literal — a million-key deletion list as an
        # expression tree would choke the planner (r12 review #1).
        n_hits = back.join(F.broadcast(ids_df), "__k", "left_semi").count()
        if n_hits == 0:
            return {"affected_shards": touched, "rewritten": 0,
                    "dropped_shards": [], "n_deleted": 0}
        kept = back.join(F.broadcast(ids_df), "__k", "left_anti")
        preserve = {
            e["name"]: e for s, e in entries.items() if s not in touched
        }
        new_rows = export_tar_shards(
            kept, path, "__k", dict(content_cols), shard_space, salt,
            _preserve=preserve,
        )
    finally:
        back.unpersist()
    rewritten = {int(m.shard) for m in new_rows}
    dropped = [s for s in touched if s not in rewritten]
    return {
        "affected_shards": touched,
        "rewritten": len(rewritten),
        "dropped_shards": dropped,
        "n_deleted": int(n_hits),
    }
