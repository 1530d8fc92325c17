"""Versioned snapshot store: a minimal transaction-log table format
(manifest-per-version over immutable parquet files — the Delta/Iceberg
trade re-expressed with nothing but a directory of JSON manifests).

Why an engine needs it at 100 TB: plain ``overwrite`` is a
delete-then-write hole (readers see a missing or half-written table),
concurrent writers silently clobber each other, and there is no way to
reproduce "the table as training run X saw it".  A log of immutable
manifests fixes all three: readers resolve ONE manifest and read the
immutable files it lists; writers race on an atomic create of the next
manifest (optimistic concurrency — the loser re-reads and retries);
any past version stays readable until vacuumed.

Layout::

    <path>/_log/v00000001.json   {"version","parent","op","adds",...}
    <path>/_log/_identity        store identity stamp (uuid, see below)
    <path>/data/<uuid>/part-*.parquet

Manifest creation is ``os.link`` of a written temp file onto the final
name — an atomic create-if-absent on POSIX, so two writers cannot both
commit the same version.  Data files are written BEFORE the manifest;
a crashed writer leaves only unreferenced files (cleaned by
:func:`vacuum`), never a corrupt table.

DELTA manifests (round 13): an append manifest records only the files
it ADDED (``"adds"``) — O(new files) json per commit instead of the
full cumulative list, so a B-batch ingest writes O(total files) log
bytes instead of O(B·F).  The full list as of a version is
reconstructed by walking parents down to the nearest SELF-CONTAINED
manifest (an overwrite, a legacy full-list manifest, or the
materialized floor :func:`vacuum` leaves — see below), memoized per
process in :data:`_FILES_CACHE`.  ``vacuum`` rewrites the oldest
RETAINED manifest with its full reconstructed list before dropping
its ancestors, so every surviving version stays reconstructible
(logical content unchanged — readers see the same list either way).

Per-process caches (:data:`_TAG_CACHE`, :data:`_FILES_CACHE`) key on
an identity stamp written at table creation (``_log/_identity``): a
store deleted and rebuilt at the same path gets a NEW stamp, so a
warm process can never serve the dead store's tags or file lists even
when the rebuilt log reaches an equal-or-higher version number.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["commit_snapshot", "read_snapshot", "read_changes",
           "latest_version", "history", "vacuum", "snapshot_sink",
           "committed_batches", "commit_tagged_once", "added_files",
           "ConcurrentCommitError"]


class ConcurrentCommitError(RuntimeError):
    """A commit with an ``expected_parent`` precondition found a
    different latest version (another writer won) — the caller must
    re-read the table and re-derive its data before retrying."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version:08d}.json")


def _versions(path: str) -> list[int]:
    """SURVIVING manifest versions, ascending.  Never assume versions
    are contiguous from 1 — :func:`vacuum` drops old manifests, so the
    log is a suffix (plus whatever keep pattern a future tool leaves)."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:9]) for f in os.listdir(d)
                  if f.startswith("v") and f.endswith(".json"))


def latest_version(path: str) -> int | None:
    """Highest committed version, or None for an empty/absent table."""
    vs = _versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _store_id(path: str) -> str:
    """Identity stamp distinguishing a store deleted and rebuilt at the
    same path: a uuid written once at ``_log/_identity`` (atomic
    create-if-absent — racers read the winner's).  Legacy stores get
    stamped lazily on first access.  Best-effort on read-only media
    (falls back to a constant — no rebuild protection, no crash)."""
    f = os.path.join(_log_dir(path), "_identity")
    try:
        with open(f) as fh:
            return fh.read().strip()
    except FileNotFoundError:
        pass
    try:
        os.makedirs(_log_dir(path), exist_ok=True)
        tmp = os.path.join(_log_dir(path),
                           f".tmp-id-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(uuid.uuid4().hex)
        try:
            os.link(tmp, f)
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
        with open(f) as fh:
            return fh.read().strip()
    except OSError:          # read-only store directory
        return "unstamped"


#: reconstructed file-list cache: path → (store_id, {version: tuple}).
#: Bounded: only the most recent _FILES_CACHE_KEEP versions per path
#: are retained (the hot path reads latest; incremental consumers read
#: a recent from_version) — an unbounded memo would hold O(versions ×
#: files) pointers, the same quadratic the delta manifests remove from
#: disk.
_FILES_CACHE: dict[str, tuple[str, dict[int, tuple]]] = {}
_FILES_CACHE_KEEP = 8


def _files(path: str, version: int) -> list[str]:
    """Full file list as of ``version``: walk delta (``adds``)
    manifests down to the nearest self-contained one (``files`` key —
    an overwrite, a legacy manifest, or vacuum's materialized floor),
    then fold the adds back up.  Memoized per process, keyed on the
    store identity stamp; a vacuumed ancestor surfaces as
    FileNotFoundError exactly like reading the vacuumed version
    directly (vacuum materializes the oldest retained manifest, so
    this only happens for versions that are themselves vacuumed)."""
    sid = _store_id(path)
    entry = _FILES_CACHE.get(path)
    if entry is None or entry[0] != sid:
        entry = (sid, {})
        _FILES_CACHE[path] = entry
    memo = entry[1]
    chain: list[tuple[int, dict]] = []
    v: int | None = version
    while v is not None and v not in memo:
        m = _read_manifest(path, v)
        if "files" in m:            # self-contained: walk terminator
            memo[v] = tuple(m["files"])
            break
        chain.append((v, m))
        v = m.get("parent")
    for v2, m in reversed(chain):
        parent = m.get("parent")
        base = memo[parent] if parent is not None else ()
        memo[v2] = base + tuple(m["adds"])
    out = list(memo[version])
    if len(memo) > 2 * _FILES_CACHE_KEEP:
        for old in sorted(memo)[:-_FILES_CACHE_KEEP]:
            del memo[old]
    return out


def added_files(path: str, version: int) -> list[str]:
    """Files ADDED by ``version``'s commit: O(1) manifest reads for
    delta manifests (the ``adds`` list IS the answer); legacy
    full-list appends fall back to the full-minus-parent diff."""
    m = _read_manifest(path, version)
    if "adds" in m:
        return list(m["adds"])
    parent = m.get("parent")
    if m.get("op") == "overwrite" or not parent:
        return list(m["files"])
    pf = set(_files(path, parent))
    return [f for f in m["files"] if f not in pf]


def history(path: str) -> list[dict]:
    """Surviving manifests, oldest first (version/op/file count/ts).
    Vacuumed versions simply don't appear (they are gone, not an
    error)."""
    out = []
    for i in _versions(path):
        m = _read_manifest(path, i)
        out.append({"version": m["version"], "op": m["op"],
                    "n_files": len(_files(path, i)), "ts": m["ts"]})
    return out


#: sentinel: "no expected_parent precondition given"
_ANY_PARENT = object()


def commit_snapshot(df: DataFrame, path: str, mode: str = "append",
                    max_retries: int = 10,
                    expected_parent: int | None | object = _ANY_PARENT,
                    stream_tag: dict | None = None) -> int:
    """Write ``df`` as the next version of the table at ``path``.

    ``mode='append'`` adds the new files to the parent version's list;
    ``mode='overwrite'`` replaces it.  Returns the committed version.
    Concurrency: the manifest is created with an atomic
    create-if-absent; on conflict the commit re-reads the log and
    retries against the new parent (the data files are already written
    and version-independent, so retries cost one hardlink attempt).

    ``expected_parent`` turns that blind retry into a PRECONDITION:
    the commit succeeds only if the table's latest version still equals
    it (None = empty table); otherwise :class:`ConcurrentCommitError`
    is raised WITHOUT committing.  Required whenever ``df`` was derived
    FROM the parent state (read-modify-write, e.g. incremental
    aggregate refreshes) — a blind retry would re-link data computed
    from a stale parent and silently erase the winner's update.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_dir(path), exist_ok=True)
    _store_id(path)                 # stamp identity at table creation
    data_dir = os.path.join(path, "data", uuid.uuid4().hex)
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
    conditioned = expected_parent is not _ANY_PARENT
    for _ in range(max_retries):
        parent = latest_version(path)
        if conditioned and parent != expected_parent:
            raise ConcurrentCommitError(
                f"expected parent {expected_parent}, table at {path} "
                f"is now v{parent} — re-read and re-derive")
        version = (parent or 0) + 1
        manifest = {"version": version, "parent": parent, "op": mode,
                    "ts": time.time(), "schema": df.schema.json()}
        if mode == "append" and parent:
            # DELTA manifest: O(new files) json, never the parent list
            manifest["adds"] = new_files
        else:
            # overwrite (or first version): self-contained terminator
            manifest["files"] = new_files
        if stream_tag is not None:
            manifest["stream"] = stream_tag
        tmp = os.path.join(_log_dir(path),
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, _manifest_path(path, version))
            return version
        except FileExistsError:
            continue   # lost the race — re-read the log and retry
        finally:
            os.unlink(tmp)
    raise RuntimeError(
        f"commit_snapshot lost {max_retries} version races at {path}")


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame:
    """The table as of ``version`` (default: latest).  Reads exactly
    the files that manifest lists — immutable, so the result is
    reproducible forever (until vacuumed)."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version at {path}")
    files = _files(path, v)
    if not files:
        from pyspark.sql.types import StructType
        m = _read_manifest(path, v)
        schema = StructType.fromJson(json.loads(m["schema"]))
        return spark.createDataFrame([], schema)
    # mergeSchema: appended versions may have ADDED columns —
    # older files surface NULLs for them (schema evolution)
    return spark.read.option("mergeSchema", "true") \
        .parquet(*files)


def vacuum(path: str, keep_versions: int = 1,
           grace_sec: float = 600.0) -> dict:
    """Delete data files referenced ONLY by manifests older than the
    newest ``keep_versions``, drop those manifests, and clean crash
    leftovers.  Returns counts.  Time travel to vacuumed versions stops
    working — that is the point.

    Files referenced by NO manifest at all are ambiguous: crash
    leftover, or an IN-FLIGHT commit (data is written before its
    manifest links — deleting it would gut the winner's table or lose
    its data).  Those are only deleted when older than ``grace_sec``
    (Delta-style retention window); committed-then-vacuumed files are
    deleted regardless, since no future commit can reference them
    except through a retained manifest.

    Delta manifests: before dropping any ancestor, the OLDEST retained
    manifest is MATERIALIZED — atomically rewritten with its full
    reconstructed ``files`` list (logical content identical; the
    ``stream`` tag, op and schema are preserved) — so every retained
    version keeps reconstructing after its parents are gone.  A crash
    between the rewrite and the drops just leaves extra self-contained
    manifests; the next vacuum finishes the job.  (A reader that
    resolved the floor manifest in its pre-materialization delta form
    and only follows the parent pointer after the drops sees a
    transient FileNotFoundError — the same read-vs-vacuum window
    time-travel reads always had; retry re-resolves the materialized
    floor.)
    """
    vs = _versions(path)
    if not vs:
        return {"files_deleted": 0, "manifests_deleted": 0}
    keep_from = vs[-1] - keep_versions + 1
    live: set[str] = set()        # referenced by a RETAINED manifest
    referenced: set[str] = set()  # referenced by ANY surviving manifest
    for i in vs:                  # ascending: each walk is O(1) amortized
        fl = _files(path, i)
        referenced.update(fl)
        if i >= keep_from:
            live.update(fl)
    # materialize the retention floor BEFORE any manifest drops
    floor = min((i for i in vs if i >= keep_from), default=None)
    if floor is not None and any(i < keep_from for i in vs):
        m = _read_manifest(path, floor)
        if "files" not in m:
            m["files"] = _files(path, floor)
            m.pop("adds", None)
            m["materialized"] = True
            tmp = os.path.join(_log_dir(path),
                               f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as fh:
                json.dump(m, fh)
            os.replace(tmp, _manifest_path(path, floor))
    now = time.time()

    def _old_enough(full: str) -> bool:
        try:
            return now - os.path.getmtime(full) > grace_sec
        except OSError:
            return False

    deleted = 0
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        for sub in os.listdir(data_root):
            subdir = os.path.join(data_root, sub)
            entries = os.listdir(subdir)
            committed_dir = any(os.path.join(subdir, f) in referenced
                                for f in entries)
            for f in entries:
                full = os.path.join(subdir, f)
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    if full in live:
                        continue
                    if full in referenced or _old_enough(full):
                        os.unlink(full)
                        deleted += 1
                elif f.startswith(("_", ".")):   # writer markers
                    # safe once the dir's data is committed (the write
                    # finished) or past the grace window
                    if committed_dir or _old_enough(full):
                        os.unlink(full)
            if not os.listdir(subdir):
                os.rmdir(subdir)
    dropped = 0
    for i in vs:
        if i < keep_from:
            os.unlink(_manifest_path(path, i))
            dropped += 1
    return {"files_deleted": deleted, "manifests_deleted": dropped}


def read_changes(spark: SparkSession, path: str, from_version: int,
                 to_version: int | None = None) -> DataFrame:
    """Rows ADDED between two versions: the files listed by
    ``to_version`` (default: latest) but not by ``from_version`` —
    the change feed that lets a downstream consumer (e.g.
    ``incremental.incremental_agg``) process exactly-once per version
    without rescanning the table.  File identity works because data
    files are immutable: an overwrite writes NEW files, so its rows
    all appear as additions (removed rows are not represented — this
    is an append-oriented feed; diff snapshots for full CDC).
    """
    v_to = latest_version(path) if to_version is None else to_version
    if v_to is None or from_version > v_to:
        raise ValueError(f"bad version range {from_version}..{v_to}")
    new = set(_files(path, v_to))
    old = set(_files(path, from_version)) \
        if from_version > 0 else set()
    added = sorted(new - old)
    if not added:
        from pyspark.sql.types import StructType
        m = _read_manifest(path, v_to)
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(m["schema"])))
    return spark.read.parquet(*added)


#: incremental stream-tag index: path → (store_id,
#: {version: stream_tag|None}).  Manifest TAGS are immutable once
#: linked (vacuum's materialization rewrites file lists, never tags),
#: so each version's tag only needs to be read once per process —
#: without this every micro-batch of every sink re-reads the WHOLE
#: log (O(B²) manifest parses over a B-batch stream's lifetime).
#: Keyed on the store identity stamp so a store deleted and rebuilt
#: at the same path can never be served the dead store's tags, even
#: when the rebuilt log reaches an equal-or-higher version number.
_TAG_CACHE: dict[str, tuple] = {}


def committed_batches(path: str, query_key: str) -> set[int]:
    """Streaming batch ids already committed for ``query_key``.

    Iterates SURVIVING manifests only — after a :func:`vacuum` the tail
    of the log still carries every retained version's tags, and append
    commits never rewrite tags, so a batch id vacuumed out of the log
    is by definition older than every retained version (its rows are
    already folded into the retained snapshots; Structured Streaming
    replays only recent batches, far inside ``keep_versions``).
    Callers pairing vacuum with a streaming sink should keep at least
    the checkpoint's replayable horizon of versions.

    Incremental: per-version tags fold into a per-process index and
    only manifests NOT yet seen are read (manifests are immutable;
    concurrent writers' commits land as new versions and are picked
    up by the catch-up scan; vacuumed versions evict from the index,
    keeping the surviving-manifests-only semantics above exactly).
    Per-call cost is O(log length) set ops + O(new versions) manifest
    reads — vacuum bounds the former, and the latter replaces the
    O(whole log) re-read every micro-batch used to pay.  The index is
    keyed on the store identity stamp (``_log/_identity``): a store
    deleted and rebuilt at the same path — not a supported pattern
    for live sinks, but tests/tools do it — gets a fresh stamp and
    the index resets, even when the rebuilt log reaches an equal-or-
    higher version number before the warm process's next call."""
    vs = _versions(path)
    if not vs:
        _TAG_CACHE.pop(path, None)
        return set()
    sid = _store_id(path)
    entry = _TAG_CACHE.get(path)
    if entry is None or entry[0] != sid:
        entry = (sid, {})
        _TAG_CACHE[path] = entry
    cache = entry[1]
    live = set(vs)
    for i in list(cache):
        if i not in live:
            del cache[i]           # vacuumed: tag leaves the result
    out = set()
    for i in vs:
        if i not in cache:
            cache[i] = _read_manifest(path, i).get("stream")
        tag = cache[i]
        if tag and tag.get("query") == query_key:
            out.add(int(tag["batch_id"]))
    return out


def snapshot_sink(path: str, query_key: str):
    """An EXACTLY-ONCE ``foreachBatch`` function writing a stream into
    the snapshot store: each micro-batch appends one version tagged
    ``(query_key, batch_id)``, and a replayed batch (restart after a
    sink failure — Structured Streaming's at-least-once contract) is
    detected in the log and skipped, so rows land exactly once.

    The check-then-commit race is closed by the store itself: a replay
    that loses the version race re-reads the log, sees its batch id,
    and skips (:func:`commit_tagged_once` dedupes on the manifest tags
    between link attempts).
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        commit_tagged_once(batch_df, path, query_key, batch_id)
    return write


def commit_tagged_once(df: DataFrame, path: str, query_key: str,
                       batch_id: int, max_retries: int = 3) -> None:
    """EXACTLY-ONCE tagged append: skip if ``(query_key, batch_id)``
    is already in the log; otherwise write the data files ONCE and
    retry only the atomic manifest link on lost version races,
    re-checking the tag log between attempts (a concurrent writer that
    committed the same batch turns the retry into a no-op).  Losing a
    race to a DIFFERENT batch costs one hardlink attempt, never a data
    rewrite — the one orphan case left is a concurrent same-batch
    winner, whose loser's files fall to vacuum's grace-window sweep.
    """
    bid = int(batch_id)
    if bid in committed_batches(path, query_key):
        return
    os.makedirs(_log_dir(path), exist_ok=True)
    _store_id(path)                 # stamp identity at table creation
    data_dir = os.path.join(path, "data", uuid.uuid4().hex)
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(("_", ".")))
    for _ in range(max_retries):
        parent = latest_version(path)
        version = (parent or 0) + 1
        manifest = {"version": version, "parent": parent,
                    "op": "append", "ts": time.time(),
                    "schema": df.schema.json(),
                    "stream": {"query": query_key, "batch_id": bid}}
        if parent:
            manifest["adds"] = new_files   # DELTA: O(new files) json
        else:
            manifest["files"] = new_files  # first version: terminator
        tmp = os.path.join(_log_dir(path),
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, _manifest_path(path, version))
            return
        except FileExistsError:
            if bid in committed_batches(path, query_key):
                return   # a concurrent writer committed this batch
        finally:
            os.unlink(tmp)
    raise RuntimeError(
        f"commit_tagged_once lost {max_retries} version races for "
        f"batch {batch_id} at {path}")
