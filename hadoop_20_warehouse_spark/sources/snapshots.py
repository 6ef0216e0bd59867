"""Versioned snapshot tables: atomic commits, time travel, incremental
reads — the dataset-versioning layer a corpus release pipeline needs.

The reference engine has no table format: a "dataset version" there is
a directory convention plus ``FileOutputCommitter``'s job-level rename
(``src/mapred/org/apache/hadoop/mapred/FileOutputCommitter.java:soft``
commit = rename of the temporary output dir), and readers that want
"the corpus as of last Tuesday" keep dated directory copies.  This
module supplies the missing capability Spark-first, in the shape of the
public log-structured table formats (Iceberg's snapshot + manifest
model, Hive ACID's base/delta model — design ideas only, no code):

* a table is a directory: immutable parquet **data files** plus a
  ``_snapshots/`` log of JSON **manifests**, one per committed version;
* a commit writes new data files, then publishes a manifest naming the
  complete file set of the new version — publication is a single
  atomic create-no-overwrite of ``v{N}.json``, so concurrent writers
  race on the version slot and exactly one wins
  (:class:`SnapshotConflictError` for the loser — optimistic
  concurrency, no locks);
* readers resolve a manifest (latest or ``version=``) and read exactly
  the files it names — writers never disturb a concurrent reader, and
  any historical version stays readable (time travel) until expired.

Scale posture (the point of the design): ONLY metadata crosses the
manifest layer — O(files) JSON entries per version, no row data.  Data
files are written by ordinary distributed ``df.write.parquet`` jobs;
copy-on-write delete rewrites only the files whose stats admit a match;
compaction coalesces small files without touching row content; per-file
min/max stats let :func:`read_snapshot` drop non-overlapping files
before Spark ever opens a footer.  On local[*] the atomic create is a
POSIX hard link; on a real cluster the same contract is HDFS
``create(..., overwrite=false)`` or an object store's conditional put
(documented here, same code path gated by filesystem).

Every file entry carries ``added`` — the version whose commit
introduced its ROWS.  Copy-on-write delete preserves it (surviving rows
keep their provenance) and compaction merges only within one ``added``
group, so :func:`incremental_read` (rows landed in ``(from, to]``) is
EXACT across arbitrary later deletes and compactions, not best-effort.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "SnapshotConflictError",
    "create_table",
    "commit_append",
    "commit_delete_where",
    "commit_compact",
    "commit_merge",
    "commit_add_columns",
    "expire_snapshots",
    "clean_orphans",
    "create_tag",
    "list_tags",
    "read_snapshot",
    "incremental_read",
    "change_feed",
    "snapshot_history",
    "latest_version",
    "last_committed_batch",
    "streaming_sink",
]


class SnapshotConflictError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency).  Re-read the latest manifest and retry the commit."""


# --------------------------------------------------------------------------
# manifest plumbing (driver-side metadata only)
# --------------------------------------------------------------------------


def _snap_dir(table: str) -> str:
    return os.path.join(table, "_snapshots")


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(_snap_dir(table), f"v{version:08d}.json")


def latest_version(table: str) -> int:
    """Highest committed version, 0 if the table does not exist yet.
    Resolution is a directory listing — no pointer file, so there is
    nothing to get stale and the commit CAS is the only write race."""
    d = _snap_dir(table)
    if not os.path.isdir(d):
        return 0
    vers = [
        int(name[1:9])
        for name in os.listdir(d)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(vers, default=0)


def _load_manifest(table: str, version: int) -> dict:
    path = _manifest_path(table, version)
    try:
        with open(path, "rb") as f:
            return json.loads(f.read())
    except FileNotFoundError:
        raise ValueError(
            f"snapshot table {table!r} has no version {version}"
        ) from None


def _publish(table: str, manifest: dict) -> int:
    """Atomically publish ``manifest`` as the next version.

    Write to a temp name, then hard-link it to the final ``v{N}.json``:
    ``os.link`` fails with EEXIST if any other writer already claimed
    the slot, which is the whole concurrency story — one syscall, no
    lock, loser retries from the new latest.  (HDFS analog:
    ``create(path, overwrite=false)``; S3 analog: conditional PUT with
    If-None-Match.)"""
    version = manifest["version"]
    d = _snap_dir(table)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    final = _manifest_path(table, version)
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise SnapshotConflictError(
            f"version {version} of {table!r} was committed concurrently"
        ) from None
    finally:
        os.unlink(tmp)
    return version


# --------------------------------------------------------------------------
# data-file plumbing (distributed writes, one stats job per commit)
# --------------------------------------------------------------------------


def _json_safe(v):
    """Stats bounds must survive a JSON round-trip AND compare
    consistently with caller-supplied prune bounds.  Numbers, strings,
    bools and None pass through; temporal and other types serialize as
    their ISO-ish ``str()`` — which preserves ordering for timestamps/
    dates, so pruning on them works when the caller passes the same
    string form (documented on :func:`read_snapshot`)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    return str(v)


def _write_data_files(
    df: DataFrame,
    table: str,
    added: int,
    stats_cols: tuple[str, ...],
) -> list[dict]:
    """Write ``df`` as parquet under a fresh per-commit subdir and
    return manifest entries (relative path, rows, bytes, per-column
    min/max) for every file produced.

    The write is an ordinary distributed parquet job; the stats pass is
    ONE distributed aggregation grouped by ``input_file_name`` — file
    count many output rows, so the collect is bounded metadata, same
    contract as the MapFile first-key table."""
    sub = f"data/c{added:08d}-{uuid.uuid4().hex[:8]}"
    staged = os.path.join(table, sub)
    df.write.mode("errorifexists").parquet(staged)
    spark = df.sparkSession
    files = sorted(glob(os.path.join(staged, "part-*.parquet")))
    if not files:
        return []
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"_min_{c}"))
        aggs.append(F.max(c).alias(f"_max_{c}"))
    stat_rows = (
        spark.read.parquet(staged)
        .groupBy(F.input_file_name().alias("_file"))
        .agg(*aggs)
        .collect()
    )
    by_name = {os.path.basename(r["_file"]): r for r in stat_rows}
    entries = []
    for path in files:
        base = os.path.basename(path)
        r = by_name.get(base)
        if r is None:  # empty part file: no rows, carry no entry
            continue
        stats = {
            c: [_json_safe(r[f"_min_{c}"]), _json_safe(r[f"_max_{c}"])]
            for c in stats_cols
        }
        entries.append(
            {
                "path": f"{sub}/{base}",
                "rows": int(r["_rows"]),
                "bytes": os.path.getsize(path),
                "added": added,
                "stats": stats,
            }
        )
    return entries


def _next_manifest(
    table: str,
    parent: int,
    operation: str,
    files: list[dict],
    schema_json: str,
    stats_cols: tuple[str, ...],
    streams: dict | None = None,
    txn: tuple[str, int] | None = None,
) -> dict:
    """``streams`` maps stream_id → last committed batch id, copied
    forward by EVERY commit (bounded: one entry per distinct writing
    stream) so :func:`streaming_sink` idempotence survives interleaved
    batch commits — the same transaction-version table the public
    log-structured formats keep for exactly-once sinks."""
    streams = dict(streams or {})
    if txn is not None:
        streams[txn[0]] = txn[1]
    return {
        "version": parent + 1,
        "parent": parent,
        "operation": operation,
        "committed_at": time.time(),
        "schema": schema_json,
        "stats_cols": list(stats_cols),
        "streams": streams,
        "files": files,
    }


# --------------------------------------------------------------------------
# public commit API
# --------------------------------------------------------------------------


def _check_schema(df: DataFrame, schema_json: str, what: str) -> None:
    """Reject a frame whose columns don't match the table (by name and
    type, order- and nullability-insensitive).  Without this, a
    misspelled column silently lands as all-NULL under the
    manifest-pinned read schema — a rejected commit beats corrupted
    data.  Appends to an evolved table must carry the widened column
    (write the NULLs explicitly); that keeps every file self-
    describing for foreign parquet readers."""
    want = {
        f.name: f.dataType.simpleString()
        for f in StructType.fromJson(json.loads(schema_json)).fields
    }
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if got != want:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        changed = sorted(
            n for n in set(want) & set(got) if want[n] != got[n]
        )
        raise ValueError(
            f"{what} schema mismatch vs table: missing={missing} "
            f"extra={extra} type-changed="
            f"{[(n, want[n], got[n]) for n in changed]}"
        )


def _layout(
    df: DataFrame, cluster_by: str | None, n_files: int | None
) -> DataFrame:
    if cluster_by is not None:
        if n_files is not None:
            return df.repartitionByRange(n_files, F.col(cluster_by))
        return df.repartitionByRange(F.col(cluster_by))
    if n_files is not None:
        return df.repartition(n_files)
    return df


def create_table(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    stats_cols: tuple[str, ...] = (),
    cluster_by: str | None = None,
    n_files: int | None = None,
) -> int:
    """Create version 1 from ``df``.  ``stats_cols`` get per-file
    min/max recorded for pruning; ``cluster_by`` range-partitions the
    write on that column so the per-file ranges are TIGHT and pruning
    actually drops files (unsorted input gives every file the full
    range — stats stay correct but prune nothing).  ``n_files`` pins
    the output file count (AQE otherwise coalesces small writes to one
    file, which is right for data but defeats pruning tests/demos)."""
    if latest_version(table) != 0:
        raise ValueError(f"table {table!r} already exists")
    df = _layout(df, cluster_by, n_files)
    files = _write_data_files(df, table, added=1, stats_cols=stats_cols)
    manifest = _next_manifest(
        table, 0, "create", files, df.schema.json(), stats_cols
    )
    return _publish(table, manifest)


def commit_append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    cluster_by: str | None = None,
    n_files: int | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Append ``df`` as the next version: parent's file set plus the
    new files, stats columns inherited from the table.  ``txn``
    (stream_id, batch_id) records an exactly-once marker in the
    manifest — see :func:`streaming_sink`.  Appending to a table that
    does not exist yet creates it (version 1, no stats columns) — the
    contract a streaming sink's first micro-batch needs."""
    parent = latest_version(table)
    if parent == 0:
        prev = {
            "files": [],
            "schema": df.schema.json(),
            "stats_cols": [],
            "streams": {},
        }
    else:
        prev = _load_manifest(table, parent)
        _check_schema(df, prev["schema"], "append")
    stats_cols = tuple(prev["stats_cols"])
    df = _layout(df, cluster_by, n_files)
    new = _write_data_files(
        df, table, added=parent + 1, stats_cols=stats_cols
    )
    manifest = _next_manifest(
        table,
        parent,
        "append",
        prev["files"] + new,
        prev["schema"],
        stats_cols,
        streams=prev.get("streams"),
        txn=txn,
    )
    return _publish(table, manifest)


def _overlaps(entry: dict, col: str, lo, hi) -> bool:
    """Conservative file-range overlap test against [lo, hi]; files
    without stats for ``col`` (or with a null bound, meaning the column
    was all-null or mixed) always count as overlapping."""
    bounds = entry.get("stats", {}).get(col)
    if not bounds or bounds[0] is None or bounds[1] is None:
        return True
    fmin, fmax = bounds
    if lo is not None and fmax < lo:
        return False
    if hi is not None and fmin > hi:
        return False
    return True


def commit_delete_where(
    spark: SparkSession,
    table: str,
    predicate: str,
    prune: tuple[str, object, object] | None = None,
) -> int:
    """Copy-on-write delete: files containing NO matching row survive
    untouched (same entry, same bytes, same provenance); files with
    matches are rewritten without the matching rows, grouped by their
    ``added`` version so surviving rows keep exact provenance for
    :func:`incremental_read`.

    ``prune=(col, lo, hi)`` optionally skips files whose recorded
    min/max cannot contain a match — those are not even scanned by the
    match-count job.  Cost is therefore O(files that might match), not
    O(table): one bounded match-count job plus one rewrite job per
    touched ``added`` group (group count == commit count, small)."""
    parent = latest_version(table)
    prev = _load_manifest(table, parent)
    stats_cols = tuple(prev["stats_cols"])
    # pin the manifest schema on every scan: after commit_add_columns
    # the file set mixes pre/post-evolution layouts, and an unpinned
    # read would infer from one arbitrary file (nondeterministic
    # unresolved-column errors)
    schema = StructType.fromJson(json.loads(prev["schema"]))

    candidates = [
        e
        for e in prev["files"]
        if prune is None or _overlaps(e, *prune)
    ]
    cand_set = {e["path"] for e in candidates}
    untouched = [e for e in prev["files"] if e["path"] not in cand_set]

    touched_paths: set[str] = set()
    if candidates:
        cand_paths = [os.path.join(table, e["path"]) for e in candidates]
        hits = (
            spark.read.schema(schema).parquet(*cand_paths)
            .filter(predicate)
            .groupBy(F.input_file_name().alias("_file"))
            .count()
            .collect()
        )
        touched_paths = {os.path.basename(r["_file"]) for r in hits}

    new_files: list[dict] = list(untouched)
    rewrite: dict[int, list[dict]] = {}
    for e in candidates:
        if os.path.basename(e["path"]) in touched_paths:
            rewrite.setdefault(e["added"], []).append(e)
        else:
            new_files.append(e)

    for added, group in sorted(rewrite.items()):
        paths = [os.path.join(table, e["path"]) for e in group]
        # survivors are rows where the predicate is FALSE **or NULL** —
        # SQL DELETE only removes TRUE matches, and a bare NOT(pred)
        # would silently drop NULL-evaluating rows from the rewrite
        kept = spark.read.schema(schema).parquet(*paths).filter(
            f"({predicate}) IS NOT TRUE"
        )
        new_files.extend(
            _write_data_files(kept, table, added=added, stats_cols=stats_cols)
        )

    manifest = _next_manifest(
        table,
        parent,
        "delete",
        new_files,
        prev["schema"],
        stats_cols,
        streams=prev.get("streams"),
    )
    return _publish(table, manifest)


def commit_compact(
    spark: SparkSession,
    table: str,
    small_file_bytes: int = 64 * 1024 * 1024,
) -> int:
    """Coalesce small files WITHIN each ``added`` group into one file
    per group (row content identical, so the new version reads
    byte-for-byte equal to its parent; history still serves the old
    layout).  Grouping by ``added`` is what keeps
    :func:`incremental_read` exact across compaction — merging across
    groups would smear provenance.  Groups whose files all exceed
    ``small_file_bytes`` are left alone."""
    parent = latest_version(table)
    prev = _load_manifest(table, parent)
    stats_cols = tuple(prev["stats_cols"])

    groups: dict[int, list[dict]] = {}
    for e in prev["files"]:
        groups.setdefault(e["added"], []).append(e)

    new_files: list[dict] = []
    for added, group in sorted(groups.items()):
        small = [e for e in group if e["bytes"] < small_file_bytes]
        if len(small) < 2:
            new_files.extend(group)
            continue
        new_files.extend(e for e in group if e["bytes"] >= small_file_bytes)
        paths = [os.path.join(table, e["path"]) for e in small]
        merged = spark.read.parquet(*paths).coalesce(1)
        new_files.extend(
            _write_data_files(
                merged, table, added=added, stats_cols=stats_cols
            )
        )

    manifest = _next_manifest(
        table,
        parent,
        "compact",
        new_files,
        prev["schema"],
        stats_cols,
        streams=prev.get("streams"),
    )
    return _publish(table, manifest)


def commit_merge(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: str,
    cluster_by: str | None = None,
) -> int:
    """MERGE (upsert): rows of ``source`` replace target rows with the
    same ``on`` key; unmatched source rows are inserted.  Copy-on-write
    and delta-proportional: only files CONTAINING a matched key are
    rewritten (minus their matched rows, provenance preserved), and the
    whole ``source`` lands as new files with ``added`` = the new
    version — so :func:`incremental_read` of the window yields exactly
    the upserted rows, the CDC feed a downstream consumer wants.

    ``source`` must be unique on ``on`` (classic upsert precondition —
    checked with one aggregate; ambiguous-match merges raise instead of
    picking a winner silently).  Cost: one stats-pruned match-count job
    over candidate files + one anti-join rewrite per touched ``added``
    group + the source write.  The key-match join is a plain equi-join
    — AQE broadcasts a small source and skew-splits a large one."""
    parent = latest_version(table)
    prev = _load_manifest(table, parent)
    stats_cols = tuple(prev["stats_cols"])
    schema = StructType.fromJson(json.loads(prev["schema"]))
    _check_schema(source, prev["schema"], "merge source")

    # ONE aggregate job answers both preconditions (r18 optimization
    # round — was two: a dup-check job plus a bounds job): after the
    # key-grouped count, max(count) detects ambiguity and min/max of
    # the key are the stats bounds — the group keys ARE the keys.
    pre = (
        source.groupBy(on)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(
            F.max("_cnt").alias("dup"),
            F.min(on).alias("lo"),
            F.max(on).alias("hi"),
        )
        .collect()
    )
    if pre and (pre[0]["dup"] or 0) > 1:
        raise ValueError(f"merge source is not unique on {on!r}")

    keys = source.select(on)
    lo_hi = pre[0] if pre else {"lo": None, "hi": None}
    # stats bounds are stored JSON-safe (temporal types as ordered
    # strings) — compare like with like or a date-keyed merge would
    # raise on str < datetime
    src_lo, src_hi = _json_safe(lo_hi["lo"]), _json_safe(lo_hi["hi"])
    candidates = [
        e for e in prev["files"] if _overlaps(e, on, src_lo, src_hi)
    ]
    cand_set = {e["path"] for e in candidates}
    untouched = [e for e in prev["files"] if e["path"] not in cand_set]

    touched_paths: set[str] = set()
    if candidates:
        cand_paths = [os.path.join(table, e["path"]) for e in candidates]
        # capture the file name AT SCAN TIME: input_file_name() is only
        # defined on the scan side, not after the join's shuffle
        scan = spark.read.schema(schema).parquet(*cand_paths).withColumn(
            "_file", F.input_file_name()
        )
        hits = (
            scan.join(keys, on=on, how="left_semi")
            .groupBy("_file")
            .count()
            .collect()
        )
        touched_paths = {os.path.basename(r["_file"]) for r in hits}

    new_files: list[dict] = list(untouched)
    rewrite: dict[int, list[dict]] = {}
    for e in candidates:
        if os.path.basename(e["path"]) in touched_paths:
            rewrite.setdefault(e["added"], []).append(e)
        else:
            new_files.append(e)

    for added, group in sorted(rewrite.items()):
        paths = [os.path.join(table, e["path"]) for e in group]
        kept = spark.read.schema(schema).parquet(*paths).join(
            keys, on=on, how="left_anti"
        )
        new_files.extend(
            _write_data_files(kept, table, added=added, stats_cols=stats_cols)
        )

    src = _layout(source, cluster_by, None)
    new_files.extend(
        _write_data_files(src, table, added=parent + 1, stats_cols=stats_cols)
    )

    manifest = _next_manifest(
        table,
        parent,
        "merge",
        new_files,
        prev["schema"],
        stats_cols,
        streams=prev.get("streams"),
    )
    return _publish(table, manifest)


def commit_add_columns(
    spark: SparkSession, table: str, columns: dict[str, str]
) -> int:
    """Schema evolution, metadata-only: add nullable columns (name →
    Spark DDL type string) by publishing a manifest with the widened
    schema and the UNCHANGED file set.  No data file is touched — the
    reader pins the manifest schema on the scan, so parquet files
    written before the evolution yield NULL for the new columns, and
    later appends carry real values.  This is the O(1) ALTER TABLE a
    100 TB table needs (a rewrite-the-world migration is exactly what
    the manifest layer exists to avoid)."""
    parent = latest_version(table)
    prev = _load_manifest(table, parent)
    schema = StructType.fromJson(json.loads(prev["schema"]))
    existing = {f.name for f in schema.fields}
    clash = existing & set(columns)
    if clash:
        raise ValueError(f"columns already exist: {sorted(clash)}")
    widened = schema
    for name, ddl in columns.items():
        widened = widened.add(name, ddl, nullable=True)
    manifest = _next_manifest(
        table,
        parent,
        "schema",
        prev["files"],
        widened.json(),
        tuple(prev["stats_cols"]),
        streams=prev.get("streams"),
    )
    return _publish(table, manifest)


def expire_snapshots(table: str, keep_last: int = 1) -> dict:
    """Garbage-collect history: retain the newest ``keep_last``
    manifests, delete older manifest files AND every data file no
    retained manifest references.  Time travel to an expired version
    raises afterwards (its manifest is gone) — the documented trade of
    reclaiming storage.  Metadata-only decision procedure: the
    referenced set is a union over retained manifests' file lists,
    never a data scan; deletes are driver-side unlinks (on a cluster,
    a distributed delete over the same list).  Versions pinned by
    :func:`create_tag` are ALWAYS retained — a named release stays
    readable however far history rolls forward."""
    latest = latest_version(table)
    if latest == 0:
        return {"expired_versions": 0, "deleted_files": 0}
    keep_from = max(1, latest - max(keep_last, 1) + 1)
    keep_versions = set(range(keep_from, latest + 1)) | set(
        list_tags(table).values()
    )
    referenced: set[str] = set()
    for v in sorted(keep_versions):
        try:
            referenced.update(
                e["path"] for e in _load_manifest(table, v)["files"]
            )
        except ValueError:
            continue  # tag pinned to an already-expired version
    deleted_files = 0
    expired = 0
    for v in range(1, keep_from):
        if v in keep_versions:
            continue  # tagged: retained
        try:
            m = _load_manifest(table, v)
        except ValueError:
            continue  # already expired by an earlier run
        expired += 1
        for e in m["files"]:
            if e["path"] in referenced:
                continue
            path = os.path.join(table, e["path"])
            try:
                os.unlink(path)
                deleted_files += 1
            except FileNotFoundError:
                pass  # concurrent expiry already removed it
            referenced.add(e["path"])  # unlink once even if re-listed
        try:
            os.unlink(_manifest_path(table, v))
        except FileNotFoundError:
            pass
    return {
        "expired_versions": expired,
        "deleted_files": deleted_files,
    }


def clean_orphans(table: str, older_than_s: float = 3600.0) -> int:
    """Delete data files no EXISTING manifest references — the debris a
    commit leaves when it crashes between writing its files and
    publishing its manifest (publication is the atomic point; anything
    unpublished is garbage by definition).  ``older_than_s`` is the
    in-flight-writer guard, same as the public formats' orphan cleanup:
    a concurrent commit's files are unreferenced until its CAS lands,
    so only files older than the threshold are eligible.  Returns the
    number of files removed."""
    data_root = os.path.join(table, "data")
    if not os.path.isdir(data_root):
        return 0
    referenced: set[str] = set()
    for v in range(1, latest_version(table) + 1):
        try:
            m = _load_manifest(table, v)
        except ValueError:
            continue  # expired
        referenced.update(e["path"] for e in m["files"])
    cutoff = time.time() - older_than_s
    removed = 0
    for sub in sorted(os.listdir(data_root)):
        subdir = os.path.join(data_root, sub)
        if not os.path.isdir(subdir):
            continue
        for name in os.listdir(subdir):
            rel = f"data/{sub}/{name}"
            path = os.path.join(subdir, name)
            if rel in referenced or name.startswith(("_", ".")):
                continue  # live file, or write-metadata (_SUCCESS/.crc)
            try:
                if os.path.getmtime(path) > cutoff:
                    continue
                os.unlink(path)
                removed += 1
            except FileNotFoundError:
                continue
        # a commit dir with no referenced file left holds only write
        # metadata (_SUCCESS, .crc) — drop it wholesale
        left = os.listdir(subdir)
        if not any(f"data/{sub}/{n}" in referenced for n in left) and all(
            n.startswith(("_", ".")) for n in left
        ):
            import shutil

            shutil.rmtree(subdir, ignore_errors=True)
    return removed


# --------------------------------------------------------------------------
# exactly-once streaming sink
# --------------------------------------------------------------------------


def last_committed_batch(table: str, stream_id: str) -> int:
    """Highest batch id ``stream_id`` has committed, -1 if none —
    resolved from the latest manifest's carried-forward stream map."""
    v = latest_version(table)
    if v == 0:
        return -1
    return int(
        _load_manifest(table, v).get("streams", {}).get(stream_id, -1)
    )


def streaming_sink(
    table: str,
    stream_id: str,
    cluster_by: str | None = None,
    max_retries: int = 5,
):
    """``foreachBatch`` callable giving a Structured Streaming query
    EXACTLY-ONCE appends into a snapshot table.

    Structured Streaming's foreachBatch is at-least-once: after a
    failure the engine replays the last micro-batch with the SAME
    ``batch_id``.  The sink makes the replay a no-op by recording
    (stream_id → batch_id) inside the atomically-published manifest —
    data files and the idempotence marker commit in the same atomic
    unit, so there is no window where rows landed but the marker did
    not (the transaction-version pattern of the public log-structured
    table formats).  A :class:`SnapshotConflictError` from a concurrent
    writer triggers a re-read-and-retry, re-checking the marker first
    in case the winner WAS this batch's earlier attempt."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for _ in range(max_retries + 1):
            if batch_id <= last_committed_batch(table, stream_id):
                return  # replayed batch: already durable, skip
            try:
                commit_append(
                    spark,
                    table,
                    batch_df,
                    cluster_by=cluster_by,
                    txn=(stream_id, int(batch_id)),
                )
                return
            except SnapshotConflictError:
                continue  # lost the slot race; re-check marker, retry
        raise SnapshotConflictError(
            f"batch {batch_id} of stream {stream_id!r} lost the commit "
            f"race {max_retries + 1} times"
        )

    return sink


# --------------------------------------------------------------------------
# read API
# --------------------------------------------------------------------------


def _read_entries(
    spark: SparkSession, table: str, manifest: dict, entries: list[dict]
) -> DataFrame:
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    if not entries:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table, e["path"]) for e in entries]
    return spark.read.schema(schema).parquet(*paths)


def create_tag(table: str, name: str, version: int | None = None) -> int:
    """Pin an IMMUTABLE name ("release-v2.1-train") to a version
    (default: latest) — the reproducibility handle a training run
    records instead of a raw version number.  Published with the same
    hard-link CAS as manifests, so a tag can never be silently
    repointed (re-tagging the SAME version is an idempotent no-op;
    a different version raises).  A tagged version also survives
    :func:`expire_snapshots` only if retained — tag before expiry is
    the caller's contract, checked there via :func:`list_tags`."""
    if "/" in name or name.startswith("."):
        raise ValueError(f"invalid tag name {name!r}")
    v = latest_version(table) if version is None else version
    _load_manifest(table, v)  # must exist
    d = _snap_dir(table)
    final = os.path.join(d, f"tag-{name}.json")
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"tag": name, "version": v, "created_at": time.time()}, f)
    try:
        os.link(tmp, final)
    except FileExistsError:
        with open(final, "rb") as f:
            existing = json.loads(f.read())["version"]
        if existing != v:
            raise SnapshotConflictError(
                f"tag {name!r} already pins version {existing}"
            ) from None
    finally:
        os.unlink(tmp)
    return v


def list_tags(table: str) -> dict[str, int]:
    """name → pinned version, from the immutable tag files."""
    d = _snap_dir(table)
    out: dict[str, int] = {}
    if not os.path.isdir(d):
        return out
    for fn in os.listdir(d):
        if fn.startswith("tag-") and fn.endswith(".json"):
            with open(os.path.join(d, fn), "rb") as f:
                t = json.loads(f.read())
            out[t["tag"]] = int(t["version"])
    return out


def read_snapshot(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest).  The reader
    binds to one manifest's explicit file list — concurrent commits
    never change what it reads (snapshot isolation).

    ``prune=(col, lo, hi)`` drops files whose min/max stats are
    disjoint from [lo, hi] BEFORE Spark plans the scan — manifest-level
    partition pruning on top of parquet's own row-group pruning.  The
    prune is conservative only (kept files may still hold non-matching
    rows), so callers still apply their exact filter; with
    ``cluster_by`` writes the two prunes compose into a scan that opens
    only the overlapping files.  ``tag`` resolves a named release
    pinned by :func:`create_tag` (mutually exclusive with
    ``version``)."""
    if tag is not None:
        if version is not None:
            raise ValueError("pass version= or tag=, not both")
        tags = list_tags(table)
        if tag not in tags:
            raise ValueError(f"no tag {tag!r} on {table!r}")
        version = tags[tag]
    v = latest_version(table) if version is None else version
    manifest = _load_manifest(table, v)
    entries = manifest["files"]
    if prune is not None:
        entries = [e for e in entries if _overlaps(e, *prune)]
    return _read_entries(spark, table, manifest, entries)


def incremental_read(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows that landed in ``(from_version, to_version]`` and still
    survive at ``to_version`` — the CDC feed between two releases.
    Exact under later deletes (survivors keep their ``added``) and
    compaction (merges stay within one ``added`` group); a delete
    inside the window correctly removes its victims from the feed,
    i.e. the result is the NET new content, which is what a
    train-on-the-delta consumer wants."""
    v_to = latest_version(table) if to_version is None else to_version
    manifest = _load_manifest(table, v_to)
    entries = [
        e for e in manifest["files"] if from_version < e["added"] <= v_to
    ]
    return _read_entries(spark, table, manifest, entries)


def change_feed(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change-data feed for ``(from_version, to_version]``:
    every row tagged ``_change_type`` ('insert' | 'delete') and
    ``_change_version`` — the full CDC contract (deletions included),
    where :func:`incremental_read` gives only the net additions.

    Reconstruction is a manifest DIFF per version step, no change log
    is written at commit time (the storage-free design the manifests
    make possible):

    * inserts at v = rows of files whose ``added`` == v in manifest v;
    * deletes at v = rows of the files v REMOVED, minus the rows its
      same-``added``-group replacement files kept (an EXCEPT ALL per
      touched group — multiset semantics, so N copies deleted report
      N delete events).  Compaction replaces files with row-identical
      content, so its diff is empty by construction.

    A merge therefore reports its updates as delete+insert pairs at
    the same version — the standard upsert decomposition.  Requires
    the window's manifests (not expired) and their removed files (not
    yet vacuumed): change feeds are consumed before history is
    reclaimed; expired windows raise through ``_load_manifest``.
    Scale: cost is proportional to files TOUCHED in the window; the
    per-group EXCEPT ALL is an ordinary shuffle Spark plans (AQE
    broadcasts small replacement sides)."""
    v_to = latest_version(table) if to_version is None else to_version
    schema_json = _load_manifest(table, v_to)["schema"]
    schema = StructType.fromJson(json.loads(schema_json))
    # copy the field list — StructType wraps it by REFERENCE, so a
    # bare StructType(schema.fields).add(...) would mutate the read
    # schema too and every scan would grow phantom columns
    out_schema = (
        StructType(list(schema.fields))
        .add("_change_type", "string", nullable=False)
        .add("_change_version", "integer", nullable=False)
    )
    parts: list[DataFrame] = []

    def _tagged(paths, change, version):
        df = spark.read.schema(schema).parquet(*paths)
        return df.select(
            "*",
            F.lit(change).alias("_change_type"),
            F.lit(version).cast("int").alias("_change_version"),
        )

    prev_files = {
        e["path"]: e
        for e in _load_manifest(table, from_version)["files"]
    } if from_version > 0 else {}
    for v in range(from_version + 1, v_to + 1):
        m = _load_manifest(table, v)
        cur_files = {e["path"]: e for e in m["files"]}
        inserts = [
            e["path"] for e in m["files"] if e["added"] == v
        ]
        if inserts:
            parts.append(
                _tagged(
                    [os.path.join(table, p) for p in inserts], "insert", v
                )
            )
        # removed files, grouped by provenance, diffed against their
        # same-group replacements (rewrites keep `added`; compaction
        # diffs to empty)
        removed: dict[int, list[str]] = {}
        for p, e in prev_files.items():
            if p not in cur_files:
                removed.setdefault(e["added"], []).append(p)
        for added, old_paths in sorted(removed.items()):
            if added == v:
                continue  # this version's own inserts, never deletes
            new_paths = [
                e["path"]
                for e in m["files"]
                if e["added"] == added and e["path"] not in prev_files
            ]
            old_df = spark.read.schema(schema).parquet(
                *[os.path.join(table, p) for p in old_paths]
            )
            if new_paths:
                new_df = spark.read.schema(schema).parquet(
                    *[os.path.join(table, p) for p in new_paths]
                )
                old_df = old_df.exceptAll(new_df)
            parts.append(
                old_df.select(
                    "*",
                    F.lit("delete").alias("_change_type"),
                    F.lit(v).cast("int").alias("_change_version"),
                )
            )
        prev_files = cur_files

    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_history(table: str) -> list[dict]:
    """Commit log, oldest first: version, parent, operation, file
    count, row count — metadata only, never opens a data file.
    Versions removed by :func:`expire_snapshots` are simply absent."""
    out = []
    for v in range(1, latest_version(table) + 1):
        try:
            m = _load_manifest(table, v)
        except ValueError:
            continue  # expired
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
                "n_rows": sum(e["rows"] for e in m["files"]),
            }
        )
    return out
