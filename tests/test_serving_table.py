"""ServingTable: bucketed partial rewrite, crash-safe swap, FS shim.

Covers the InFlightBatch-style commit barrier (InFlightBatch.java:27-113)
and the O(touched-buckets) merge the reference gets from per-bucket
processing (PaimonIngestor.java:661-712)."""

import hashlib
import os

from pyspark.sql import Row
from pyspark.sql import types as T

from platypus_ingestion_plugins_spark import fs
from platypus_ingestion_plugins_spark.serving.table import BUCKET_COL, ServingTable

CDC_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("_row_kind", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)


def _batch(spark, *ops):
    return spark.createDataFrame(
        [Row(_seq=s, _row_kind=k, id=i, title=t) for s, k, i, t in ops], CDC_SCHEMA
    )


def _dir_digest(path):
    """Stable digest of a directory tree: relative names + bytes."""
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(path)):
        for name in sorted(files):
            if name.startswith("."):
                continue  # CRC sidecars
            p = os.path.join(root, name)
            h.update(os.path.relpath(p, path).encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def _bucket_of(spark, table, key):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame([Row(id=key)])
        .select(F.pmod(F.hash("id"), F.lit(table.num_buckets)).alias("b"))
        .collect()[0][0]
    )


def test_partial_rewrite_leaves_untouched_buckets_bitwise_identical(spark, tmp_path):
    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id", num_buckets=8)
    keys = [f"k{i}" for i in range(32)]
    tbl.apply_batch(_batch(spark, *[(i, "+I", k, "v1") for i, k in enumerate(keys)]))

    target = keys[0]
    tb = _bucket_of(spark, tbl, target)
    before = {
        d: _dir_digest(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith(f"{BUCKET_COL}=")
    }
    assert len(before) > 1  # data actually spread over several buckets

    tbl.apply_batch(_batch(spark, (100, "+U", target, "v2")))

    after = {
        d: _dir_digest(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith(f"{BUCKET_COL}=")
    }
    changed_dir = f"{BUCKET_COL}={tb}"
    assert after[changed_dir] != before[changed_dir]
    for d, digest in before.items():
        if d != changed_dir:
            assert after[d] == digest, f"untouched bucket {d} was rewritten"

    state = {r.id: r.title for r in tbl.query().collect()}
    assert state[target] == "v2"
    assert len(state) == 32
    # no staging/old residue after a committed batch
    assert not fs.exists(spark, path + "__staging")
    assert not fs.exists(spark, path + "__old")


def test_partial_rewrite_drops_emptied_bucket_dir(spark, tmp_path):
    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id", num_buckets=4)
    tbl.apply_batch(_batch(spark, (1, "+I", "only", "v1")))
    b = _bucket_of(spark, tbl, "only")
    assert os.path.isdir(os.path.join(path, f"{BUCKET_COL}={b}"))

    tbl.apply_batch(_batch(spark, (2, "-D", "only", "v1")))
    assert not os.path.exists(os.path.join(path, f"{BUCKET_COL}={b}"))
    assert tbl.query().count() == 0


def test_full_rewrite_crash_between_renames_recovers(spark, tmp_path):
    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id")
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))

    # simulate a crash after `path -> path__old` but before
    # `staging -> path`: the table dir is gone, only the kept-aside
    # copy remains
    os.rename(path, path + "__old")
    assert not os.path.exists(path)

    state = {r.id: r.title for r in tbl.query().collect()}
    assert state == {"a": "v1"}
    assert not os.path.exists(path + "__old")


def test_bucket_swap_crash_mid_swap_restores_bucket(spark, tmp_path):
    """A crash BETWEEN the two renames of one bucket's swap leaves that
    bucket's only copy under the kept-aside dir. Recovery must rename
    it back — deleting it would permanently lose every key in the
    bucket that the (replayable) changelog doesn't mention."""
    from platypus_ingestion_plugins_spark.serving.table import SWAP_MARKER

    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id", num_buckets=8)
    keys = [f"k{i}" for i in range(32)]
    tbl.apply_batch(_batch(spark, *[(i, "+I", k, "v1") for i, k in enumerate(keys)]))

    b = _bucket_of(spark, tbl, "k0")
    part = f"{BUCKET_COL}={b}"
    # simulate _swap_buckets dying after `live -> __old/part` and before
    # `staged -> live`: marker + the moved bucket under __old, staged
    # replacement still in __staging
    os.makedirs(path + "__old")
    with open(os.path.join(path + "__old", SWAP_MARKER), "w"):
        pass
    os.rename(os.path.join(path, part), os.path.join(path + "__old", part))
    os.makedirs(path + "__staging/" + part)
    with open(os.path.join(path + "__staging", part, "junk.parquet"), "w") as f:
        f.write("uncommitted")

    state = {r.id: r.title for r in tbl.query().collect()}
    assert len(state) == 32, "keys in the mid-swap bucket were lost"
    assert state["k0"] == "v1"
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__staging")


def test_full_rewrite_completed_swap_cleanup_drops_stale_copy(spark, tmp_path):
    """The OTHER both-present case: a full rewrite's swap completed but
    cleanup didn't. The kept-aside dir carries no partial-swap marker
    and is entirely stale — recovery must NOT resurrect its buckets
    (the new table may legitimately have dropped one)."""
    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id", num_buckets=4)
    tbl.apply_batch(_batch(spark, (1, "+I", "gone", "v1")))
    b = _bucket_of(spark, tbl, "gone")
    # overwrite to a state WITHOUT key "gone" (its bucket dir disappears)
    tbl.overwrite(spark.createDataFrame([Row(id="kept", title="v1")]))
    # simulate the stale pre-overwrite copy lingering as __old
    os.makedirs(path + "__old/" + f"{BUCKET_COL}={b}")
    with open(os.path.join(path + "__old", f"{BUCKET_COL}={b}", "stale.parquet"), "w") as f:
        f.write("stale")
    state = {r.id for r in tbl.query().collect()}
    assert state == {"kept"}
    assert not os.path.exists(os.path.join(path, f"{BUCKET_COL}={b}"))
    assert not os.path.exists(path + "__old")


def test_lookup_int_key_prunes_to_right_bucket(spark, tmp_path):
    """murmur3 is type-sensitive: hash(7 as int) != hash(7 as bigint).
    A Python int literal must be cast to the stored key type before the
    bucket hash, or the lookup prunes to the wrong directory and
    silently returns nothing."""
    schema = T.StructType(
        [
            T.StructField("_seq", T.LongType()),
            T.StructField("_row_kind", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("title", T.StringType()),
        ]
    )
    tbl = ServingTable(spark, str(tmp_path / "ik"), key="id", num_buckets=8)
    rows = [Row(_seq=i, _row_kind="+I", id=i, title=f"v{i}") for i in range(64)]
    tbl.apply_batch(spark.createDataFrame(rows, schema))
    got = tbl.lookup(7).collect()
    assert [(r.id, r.title) for r in got] == [(7, "v7")]
    assert tbl.lookup(10**6).count() == 0


def test_commit_log_atomic_and_tmp_residue_ignored(spark, tmp_path):
    """The commit log lands via stage-and-rename: a crash-leftover
    .tmp never corrupts it, and no .tmp residue survives a commit."""
    path = str(tmp_path / "al")
    tbl = ServingTable(spark, path, key="id", num_buckets=2)
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))
    # crash-leftover junk from a torn staged write
    with open(os.path.join(path, "_commits.json.tmp"), "w") as f:
        f.write('[{"cor')
    tbl.apply_batch(_batch(spark, (2, "+U", "a", "v2")))
    log = tbl.commits()
    assert [e["commit_id"] for e in log] == [0, 1]
    assert not os.path.exists(os.path.join(path, "_commits.json.tmp"))


def test_stale_staging_is_discarded(spark, tmp_path):
    path = str(tmp_path / "serving")
    tbl = ServingTable(spark, path, key="id")
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))
    os.makedirs(path + "__staging")
    with open(os.path.join(path + "__staging", "junk.parquet"), "w") as f:
        f.write("not committed")
    tbl.apply_batch(_batch(spark, (2, "+U", "a", "v2")))
    assert {r.id: r.title for r in tbl.query().collect()} == {"a": "v2"}
    assert not os.path.exists(path + "__staging")


def test_bucketed_replay_idempotent(spark, tmp_path):
    tbl = ServingTable(spark, str(tmp_path / "serving"), key="id", num_buckets=4)
    b1 = _batch(spark, (1, "+I", "a", "v1"), (2, "+I", "b", "v1"))
    b2 = _batch(spark, (3, "+U", "a", "v2"), (4, "-D", "b", "v1"))
    tbl.apply_batch(b1)
    tbl.apply_batch(b2)
    tbl.apply_batch(b2)  # at-least-once redelivery
    assert {r.id: r.title for r in tbl.query().collect()} == {"a": "v2"}


def test_atomic_write_crash_between_delete_and_rename_recovers(spark, tmp_path):
    """Crash-injection for write_text_atomic's delete->rename window:
    the destination was deleted but the staged .tmp never renamed in.
    read_text must fall back to the complete .tmp, so commits() still
    returns the staged log and commit ids keep advancing."""
    path = str(tmp_path / "aw")
    tbl = ServingTable(spark, path, key="id", num_buckets=2)
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))
    tbl.apply_batch(_batch(spark, (2, "+U", "a", "v2")))
    log_path = os.path.join(path, "_commits.json")
    # simulate the crash: delete done, rename not — only the staged
    # sibling (complete by construction) remains
    os.rename(log_path, log_path + ".tmp")
    assert tbl.commits() != []
    assert [e["commit_id"] for e in tbl.commits()] == [0, 1]
    # the next commit heals the file through the normal staged write
    tbl.apply_batch(_batch(spark, (3, "+U", "a", "v3")))
    assert os.path.exists(log_path)
    assert [e["commit_id"] for e in tbl.commits()] == [0, 1, 2]
    assert not os.path.exists(log_path + ".tmp")


def test_atomic_write_torn_first_stage_reads_absent(spark, tmp_path):
    """A crash mid-write of the very first stage leaves only a torn
    .inprogress — never a .tmp — so read_text still reports absent
    instead of returning torn bytes."""
    p = str(tmp_path / "x.json")
    with open(p + ".inprogress", "w") as f:
        f.write('[{"cor')  # torn
    assert fs.read_text(spark, p) is None
    # and a subsequent atomic write overwrites the torn stage cleanly
    fs.write_text_atomic(spark, p, '["ok"]')
    assert fs.read_text(spark, p) == '["ok"]'
    assert not os.path.exists(p + ".inprogress")
    assert not os.path.exists(p + ".tmp")


def test_fs_shim_roundtrip(spark, tmp_path):
    base = str(tmp_path / "fsdir")
    assert not fs.exists(spark, base)
    fs.mkdirs(spark, base + "/sub")
    assert fs.is_dir(spark, base + "/sub")
    assert fs.list_names(spark, base) == ["sub"]
    fs.rename(spark, base + "/sub", base + "/sub2")
    assert fs.list_names(spark, base) == ["sub2"]
    fs.delete(spark, base)
    assert not fs.exists(spark, base)
    assert fs.list_names(spark, base) == []


def test_compact_bucketed(spark, tmp_path):
    tbl = ServingTable(spark, str(tmp_path / "t"), key="id", num_buckets=2)
    # a wide write fans each bucket across many tasks -> small files
    wide = spark.createDataFrame(
        [Row(id=f"k{i}", title=f"v{i}") for i in range(40)]
    ).repartition(8)
    tbl.overwrite(wide)
    before = {r.id: r.title for r in tbl.query().collect()}

    def files_per_bucket():
        out = {}
        for name in fs.list_names(spark, tbl.path):
            if name.startswith(f"{BUCKET_COL}="):
                out[name] = sum(
                    1
                    for f in fs.list_names(spark, f"{tbl.path}/{name}")
                    if f.endswith(".parquet")
                )
        return out

    assert any(n > 1 for n in files_per_bucket().values())
    compacted = tbl.compact(max_files_per_bucket=1)
    assert compacted  # something was oversized
    assert all(n == 1 for n in files_per_bucket().values())
    # data identical, and a second compact is a no-op
    assert {r.id: r.title for r in tbl.query().collect()} == before
    assert tbl.compact(max_files_per_bucket=1) == []


def test_compact_unbucketed(spark, tmp_path):
    tbl = ServingTable(spark, str(tmp_path / "u"), key="id")
    tbl.apply_batch(_batch(spark, *[(i, "+I", f"k{i}", f"v{i}") for i in range(40)]))
    before = {r.id: r.title for r in tbl.query().collect()}
    n_files = sum(1 for n in fs.list_names(spark, tbl.path) if n.endswith(".parquet"))
    if n_files > 1:
        assert tbl.compact(max_files_per_bucket=1) == [0]
    assert (
        sum(1 for n in fs.list_names(spark, tbl.path) if n.endswith(".parquet")) == 1
    )
    assert {r.id: r.title for r in tbl.query().collect()} == before


def test_lookup_prunes_to_one_bucket(spark, tmp_path):
    from pyspark.sql import functions as F

    tbl = ServingTable(spark, str(tmp_path / "pt"), key="id", num_buckets=8)
    tbl.apply_batch(
        _batch(spark, *[(i, "+I", f"k{i}", f"v{i}") for i in range(64)])
    )
    n_dirs = sum(
        1 for n in fs.list_names(spark, tbl.path) if n.startswith(f"{BUCKET_COL}=")
    )
    assert n_dirs > 1
    hit = tbl.lookup("k7")
    rows = hit.collect()
    assert [(r.id, r.title) for r in rows] == [("k7", "v7")]
    # the scan touched exactly one bucket directory
    touched = {
        r.f.split(f"{BUCKET_COL}=")[1].split("/")[0]
        for r in tbl.lookup("k7").select(F.input_file_name().alias("f")).collect()
    }
    assert len(touched) == 1
    # missing key -> empty, not an error
    assert tbl.lookup("ghost").count() == 0


def test_schema_evolution_adds_column(spark, tmp_path):
    """A later micro-batch carries a NEW column: the table widens,
    pre-existing rows read NULL for it — lakehouse add-column
    evolution through the same idempotent merge."""
    tbl = ServingTable(spark, str(tmp_path / "evo"), key="id", num_buckets=4)
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1"), (2, "+I", "b", "v1")))

    evolved = spark.createDataFrame(
        [Row(_seq=3, _row_kind="+U", id="a", title="v2", lang="en")],
        T.StructType(list(CDC_SCHEMA.fields) + [T.StructField("lang", T.StringType())]),
    )
    tbl.apply_batch(evolved)
    got = {r.id: (r.title, r.lang) for r in tbl.query().collect()}
    assert got == {"a": ("v2", "en"), "b": ("v1", None)}
    # next batch WITHOUT the new column still merges (column stays NULL)
    tbl.apply_batch(_batch(spark, (4, "+U", "b", "v3")))
    got2 = {r.id: (r.title, r.lang) for r in tbl.query().collect()}
    assert got2 == {"a": ("v2", "en"), "b": ("v3", None)}


def test_composite_key_lookup(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("_seq", T.LongType()),
            T.StructField("_row_kind", T.StringType()),
            T.StructField("tenant", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("title", T.StringType()),
        ]
    )
    tbl = ServingTable(spark, str(tmp_path / "ck"), key=["tenant", "id"], num_buckets=4)
    rows = [
        Row(_seq=1, _row_kind="+I", tenant="t1", id="a", title="v1"),
        Row(_seq=2, _row_kind="+I", tenant="t2", id="a", title="v2"),
    ]
    tbl.apply_batch(spark.createDataFrame(rows, schema))
    # same id under two tenants: distinct rows, lookup scoped by full key
    assert {r.tenant: r.title for r in tbl.query().collect()} == {"t1": "v1", "t2": "v2"}
    got = tbl.lookup("t2", "a").collect()
    assert [(r.tenant, r.id, r.title) for r in got] == [("t2", "a", "v2")]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tbl.lookup("t2")


def test_commit_log(spark, tmp_path):
    tbl = ServingTable(spark, str(tmp_path / "log"), key="id", num_buckets=4)
    assert tbl.commits() == []
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1"), (2, "+I", "b", "v1")))
    tbl.apply_batch(_batch(spark, (3, "-D", "a", "v1")))
    log = tbl.commits()
    assert [e["commit_id"] for e in log] == [0, 1]
    assert log[0]["kind"] == "batch" and log[0]["n_rows"] == 2
    assert log[1]["n_rows"] == 1
    # bucketed commits record which buckets moved
    assert log[1]["buckets"] is not None and len(log[1]["buckets"]) >= 1


def test_commit_log_survives_full_rewrite_and_compact(spark, tmp_path):
    tbl = ServingTable(spark, str(tmp_path / "log2"), key="id", num_buckets=2)
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))
    tbl.overwrite(spark.createDataFrame([Row(id="a", title="v2")]))
    tbl.compact(max_files_per_bucket=0)
    kinds = [e["kind"] for e in tbl.commits()]
    assert kinds[:2] == ["batch", "overwrite"]
    assert kinds[-1] == "compact" if len(kinds) == 3 else True
    ids = [e["commit_id"] for e in tbl.commits()]
    assert ids == list(range(len(ids)))  # monotonic across the swap


def test_atomic_write_heals_orphaned_tmp_before_staging(spark, tmp_path):
    """A predecessor crashed between delete and rename, leaving only a
    .tmp. The NEXT atomic write must promote that sole surviving copy
    before staging deletes it — never a window with zero readable
    copies — and then land the new content normally."""
    p = str(tmp_path / "h.json")
    fs.write_text(spark, p + ".tmp", '["old"]')
    assert fs.read_text(spark, p) == '["old"]'  # fallback sees it
    fs.write_text_atomic(spark, p, '["new"]')
    assert fs.read_text(spark, p) == '["new"]'
    assert not os.path.exists(p + ".tmp")
    assert not os.path.exists(p + ".inprogress")


def test_compact_preserves_evolved_column(spark, tmp_path):
    """Compacting a bucket whose files mix old and new footers must
    read under the persisted sidecar schema: raw parquet inference
    picking an old footer would rewrite the bucket WITHOUT the evolved
    column, silently destroying its committed values."""
    tbl = ServingTable(spark, str(tmp_path / "cevo"), key="id", num_buckets=4)
    # spread keys over several buckets, all OLD schema footers
    keys = [f"k{i}" for i in range(16)]
    for s, k in enumerate(keys):
        tbl.apply_batch(_batch(spark, (s, "+I", k, "v1")))
    # evolve ONE bucket: its files carry the new footer, the other
    # buckets keep old footers — the mixed-footer table raw inference
    # mis-handles
    evolved = spark.createDataFrame(
        [Row(_seq=100, _row_kind="+U", id="k0", title="v2", lang="en")],
        T.StructType(list(CDC_SCHEMA.fields) + [T.StructField("lang", T.StringType())]),
    )
    tbl.apply_batch(evolved)
    before = {r.id: (r.title, r.lang) for r in tbl.query().collect()}
    assert before["k0"] == ("v2", "en")
    assert len(before) == 16

    compacted = tbl.compact(max_files_per_bucket=1)
    assert compacted, "expected at least one oversized bucket"
    after = {r.id: (r.title, r.lang) for r in tbl.query().collect()}
    assert after == before, "compact dropped or altered the evolved column"


def test_commit_log_retention_caps_entries(spark, tmp_path):
    """The audit log keeps the last 1000 records: a long-lived stream's
    per-batch commits must not grow the driver-side read-modify-write
    unboundedly. commit_id keeps advancing monotonically past the cap."""
    import json as _json

    path = str(tmp_path / "ret")
    tbl = ServingTable(spark, path, key="id", num_buckets=2)
    tbl.apply_batch(_batch(spark, (1, "+I", "a", "v1")))
    # seed a full log (cheaper than 1000 real batches)
    seeded = [
        {"commit_id": i, "kind": "merge", "n_rows": 1, "buckets": [0]}
        for i in range(1000)
    ]
    from platypus_ingestion_plugins_spark import fs as _fs

    _fs.write_text_atomic(spark, os.path.join(path, "_commits.json"), _json.dumps(seeded))
    tbl.apply_batch(_batch(spark, (2, "+U", "a", "v2")))
    log = tbl.commits()
    assert len(log) == 1000
    assert log[-1]["commit_id"] == 1000  # advanced past the seeded head
    assert log[0]["commit_id"] == 1  # oldest record aged out


def test_auto_register_fields_off_rejects_unknown_columns(spark, tmp_path):
    """Reference parity (IngestionConfig.autoRegisterFields=false):
    with auto-registration off the sidecar schema is a contract — a
    batch carrying an unregistered column is refused BEFORE any data
    lands; the permissive default still widens."""
    import pytest
    from pyspark.sql import Row

    strict = ServingTable(
        spark, str(tmp_path / "strict"), key="id", auto_register_fields=False
    )
    first = spark.createDataFrame(
        [Row(_seq=1, _row_kind="+I", id="a", title="v1")]
    )
    strict.apply_batch(first)  # first batch REGISTERS the schema
    assert {r.id for r in strict.query().collect()} == {"a"}

    widened = spark.createDataFrame(
        [Row(_seq=2, _row_kind="+I", id="b", title="v1", extra="nope")]
    )
    with pytest.raises(ValueError, match=r"unregistered column\(s\) \['extra'\]"):
        strict.apply_batch(widened)
    # nothing landed: table unchanged
    assert {r.id for r in strict.query().collect()} == {"a"}

    # the permissive default widens as before
    loose = ServingTable(spark, str(tmp_path / "loose"), key="id")
    loose.apply_batch(first)
    loose.apply_batch(widened)
    rows = {r.id: r.asDict().get("extra") for r in loose.query().collect()}
    assert rows == {"a": None, "b": "nope"}
