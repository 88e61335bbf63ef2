"""Iceberg-semantics target table.

No ``iceberg-spark-runtime`` jar ships offline with PySpark 4.1.2 (SURVEY
§7.4), so the engine's sink is a small table abstraction with
Iceberg-equivalent semantics implemented over parquet snapshots + JSON
metadata + an atomically-swapped pointer file:

* **snapshot isolation** — every MERGE writes a brand-new data directory
  and metadata file; readers only ever see the version named by
  ``_current``;
* **atomic commit** — ``os.replace`` of the pointer file is the single
  commit point; checkpoint offsets are embedded IN the snapshot
  metadata, so offsets and data commit together (exactly-once without a
  separate transaction coordinator — SURVEY §7.3);
* **schema evolution** — each snapshot records its schema; columns
  present in an incoming batch but absent from the table are appended
  (add-column), and old snapshots read with nulls for them;
* **idempotent MERGE** — per-row ``_lsn`` (last-applied LSN) and
  ``_deleted`` tombstones make re-applying any overlapping or replayed
  slice a no-op: a row only changes when the incoming LSN is strictly
  newer (newer-LSN-wins; reference analog: the job-repository restart
  state at springbatch-schema.sql:58-72, done right).

On a real cluster the same interface binds to Iceberg
(``spark.table`` + ``MERGE INTO`` + ``ALTER TABLE ADD COLUMN``); the
engine code above this layer is backend-agnostic. At 100 TB the Iceberg
backend would be bucket-partitioned on (conv_id, turn_idx) so the
merge's storage-partitioned join avoids shuffling the target side; the
emulation approximates this by hash-clustering data files on the key.
"""

from __future__ import annotations

import errno
import glob
import json
import os
import shutil
import time
import uuid

try:  # POSIX advisory locks back the commit protocol; absent (non-POSIX
    import fcntl  # or exotic FS) the protocol falls back to the
except ImportError:  # grace-period heuristic it used before r5.
    fcntl = None

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from etl_reconciliate_spark.schemas import KEY_COLS, META_LSN

META_DELETED = "_deleted"
META_COLS = [META_LSN, META_DELETED]

# Iceberg's default parquet codec (write.parquet.compression-codec) is
# zstd; matching it keeps the emulation's storage cost and CPU profile
# faithful to the real backend.
PARQUET_CODEC = "zstd"


# Safe type promotions (Iceberg's evolution rules): each chain is
# ordered narrow → wide; a column may move right along its chain only.
_PROMOTION_CHAINS = (
    ["byte", "short", "integer", "long"],
    ["float", "double"],
)


def _wider(a: T.DataType, b: T.DataType) -> T.DataType:
    """The wider of two types along a safe promotion chain; raises
    SchemaConflictError when they are on no common chain."""
    an, bn = a.typeName(), b.typeName()
    for chain in _PROMOTION_CHAINS:
        if an in chain and bn in chain:
            return a if chain.index(an) >= chain.index(bn) else b
    raise SchemaConflictError(
        f"incompatible type change {an} -> {bn}: only widening promotions "
        f"{_PROMOTION_CHAINS} are supported"
    )


class SchemaConflictError(RuntimeError):
    """A batch column's type conflicts with the table schema and is not
    a safe widening promotion."""


class SnapshotExpiredError(ValueError):
    """A version required by the requested read was dropped by
    ``expire_snapshots``.

    Subclasses ``ValueError`` for backward compatibility, but exists as
    its own type because the recovery differs from a plain bad-argument
    ``ValueError``: an expired base means the deltas are unrecoverable
    and the caller should re-snapshot / rebuild (the jobs'
    ``bootstrap_expired_cursor`` / ``rebuild_expired_base`` paths),
    whereas ``from_version > to_version`` is a caller range error that
    must fail loudly — conflating the two let a bounded export rewind a
    consumer cursor (r5 jobs review)."""


def _conform(df: DataFrame, want: T.StructType) -> DataFrame:
    """Pad columns missing from ``df`` with typed nulls and cast columns
    whose type is narrower than ``want``'s (widening evolution).

    ONE select, not a ``withColumn`` loop — this runs on every base and
    delta dir of every read, and per-column ``withColumn`` stacks one
    Project node per evolved column into every such subplan (pure
    analyzer/optimizer tax on the hottest path — r5 review). Column
    order and passthrough extras (the ``_lsn``/``_deleted`` meta cols)
    are preserved exactly as the loop produced them: existing columns
    in place, missing ``want`` columns appended."""
    have = {f_.name: f_.dataType for f_ in df.schema.fields}
    want_types = {f_.name: f_.dataType for f_ in want.fields}
    cols = []
    for name in df.columns:
        w = want_types.get(name)
        if w is not None and have[name] != w:
            cols.append(F.col(name).cast(w).alias(name))
        else:
            cols.append(F.col(name))
    for f_ in want.fields:
        if f_.name not in have:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    return df.select(cols)


class CommitConflictError(RuntimeError):
    """Another writer committed (or is committing) the same version.

    The caller's view of the table is stale: re-read metadata, recompute
    the merge/compaction from the fresh state, and retry — exactly
    Iceberg's optimistic-concurrency contract."""


def _try_flock(fd: int) -> str:
    """Non-blocking exclusive ``flock`` on ``fd``; the commit protocol's
    writer-liveness probe.

    Returns ``"acquired"`` (we own the lock until the fd closes — the
    kernel also releases it if this process dies, which is what makes
    crashed-writer takeover safe without trusting mtimes alone),
    ``"held"`` (a live process owns it), or ``"unsupported"`` (no
    ``fcntl`` on this platform, or the filesystem refuses advisory
    locks — callers fall back to the grace-period heuristic)."""
    if fcntl is None:
        return "unsupported"
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        return "acquired"
    except OSError as e:
        if e.errno in (errno.EACCES, errno.EAGAIN, errno.EWOULDBLOCK):
            return "held"
        return "unsupported"


def _claim_is_current(claim_fd: int, mp: str) -> bool:
    """True iff ``claim_fd``'s inode is still what ``mp`` names — i.e.
    the claimed file has not been replaced (another writer's publish)
    or removed out from under its holder. False on any stat failure."""
    try:
        return os.fstat(claim_fd).st_ino == os.stat(mp).st_ino
    except OSError:
        return False


class TargetTable:
    """A versioned, MERGE-able table rooted at ``path``.

    Two write modes, chosen at ``init`` and recorded in the table
    metadata (mirroring Iceberg's ``write.merge.mode``):

    * ``cow`` (copy-on-write): every MERGE rewrites the full table into
      a new snapshot — cheapest reads, O(table) write amplification per
      slice. Right for small targets / infrequent batches.
    * ``mor`` (merge-on-read): every MERGE appends only the deduplicated
      change batch as a hash-clustered **delta** file set; readers
      resolve the per-key max-``_lsn`` winner across base+deltas at scan
      time. Write cost is O(slice) regardless of table size — the only
      viable shape at 10^10 events — with automatic compaction folding
      deltas back into the base every ``compact_threshold`` commits.

    Tombstones (``_deleted``) are kept in deltas so the read-time winner
    selection sees the delete's LSN high-water mark. Whether compaction
    may DROP them depends on ``ordered_commits``:

    * ``ordered_commits=True`` (the bounded LSN-slice runner): slices
      commit in LSN order, so any post-compaction event for a dropped key
      necessarily carries a higher LSN and legitimately re-inserts it (an
      interrupted slice replays only LSNs above the last committed offset
      — see ``plans/checkpoint.py``). Tombstones are dropped.
    * ``ordered_commits=False`` (e.g. the Structured Streaming file
      source, whose discovery order is mtime- not LSN-based): a
      lower-LSN I/U for a deleted key may still arrive AFTER compaction;
      dropping the tombstone would let read-time max-LSN resolution
      resurrect the deleted row. Tombstones are retained at compaction
      (they only leave the table via ``expire_snapshots`` of pre-delete
      history, never silently).

    Writers use optimistic concurrency: the version slot is claimed by
    exclusive creation of the metadata file and OWNED via a kernel
    advisory lock (flock) held from claim through pointer swap; a
    concurrent second writer gets :class:`CommitConflictError` and must
    recompute from fresh metadata (Iceberg-style CAS). A slot older
    than ``claim_grace_secs`` whose version was never published
    (pointer still behind) AND whose lock is free is a dead
    half-commit from a crashed writer (the kernel released its lock at
    death) and is taken over; a LIVE writer — however stalled — keeps
    its lock and is never taken over. On filesystems without advisory
    locks the protocol degrades to the mtime-grace heuristic alone,
    where a live writer stalled past the grace period CAN be taken
    over (the pre-lock behavior).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 32,
        mode: str = "cow",
        compact_threshold: int = 8,
        ordered_commits: bool = True,
        claim_grace_secs: float = 60.0,
        orphan_grace_secs: float = 600.0,
    ):
        self.spark = spark
        self.path = path
        self._n_buckets_arg = n_buckets
        self._n_buckets_cache: int | None = None
        self._init_mode = mode
        self.compact_threshold = compact_threshold
        self._ordered_commits_arg = ordered_commits
        self._ordered_commits_cache: bool | None = None
        self.claim_grace_secs = claim_grace_secs
        self.orphan_grace_secs = orphan_grace_secs

    def mode(self) -> str:
        return self.metadata().get("mode", "cow")

    @property
    def ordered_commits(self) -> bool:
        """Whether commits are guaranteed LSN-ordered — a TABLE property
        recorded at commit time, NOT a per-writer setting (r4 core
        review): the flag gates tombstone dropping, and a maintainer
        constructed with the default True against a stream-fed
        (out-of-order) table would otherwise compact away tombstones
        and let later lower-LSN deliveries resurrect deleted rows. An
        existing table's recorded value always wins; the constructor
        arg applies at init."""
        if self._ordered_commits_cache is not None:
            return self._ordered_commits_cache
        try:
            recorded = self.metadata().get("ordered_commits")
        except (FileNotFoundError, OSError):
            return self._ordered_commits_arg
        if recorded is not None:
            self._ordered_commits_cache = bool(recorded)
            return self._ordered_commits_cache
        return self._ordered_commits_arg

    @property
    def n_buckets(self) -> int:
        """The table's hash-bucket count — a TABLE property fixed at
        init, NOT a per-writer setting: every data/delta dir must share
        one count or read_keys' bucket pruning opens the wrong part
        files (r4 core review: writers used to impose their constructor
        arg, so a maintainer constructed with a different
        shuffle-partitions default silently broke point lookups). An
        existing table's recorded count always wins; the constructor
        arg only applies at init time."""
        if self._n_buckets_cache is not None:
            return self._n_buckets_cache
        try:
            recorded = self.metadata().get("n_buckets")
        except (FileNotFoundError, OSError):
            return self._n_buckets_arg  # table not initialized yet
        if recorded is not None:
            self._n_buckets_cache = int(recorded)
            return self._n_buckets_cache
        return self._n_buckets_arg

    # ------------------------------------------------------------ state
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_current")

    def exists(self) -> bool:
        return os.path.exists(self._pointer)

    def current_version(self) -> int:
        with open(self._pointer) as f:
            return int(f.read().strip())

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:06d}.json")

    def metadata(self, version: int | None = None) -> dict:
        if version is None:
            version = self.current_version()
        with open(self._meta_path(version)) as f:
            body = f.read()
        if not body.strip():
            # an EMPTY vNNNNNN.json is a concurrent writer's O_EXCL
            # claim placeholder (see _commit), not published metadata —
            # surface it as not-found so readers/expire treat the
            # version as nonexistent instead of dying on JSON parse
            raise FileNotFoundError(
                f"version {version} of {self.path} is claimed but not "
                f"yet published"
            )
        return json.loads(body)

    def schema(self) -> T.StructType:
        """Current user-facing schema (no metadata columns)."""
        return T.StructType.fromJson(self.metadata()["schema"])

    def committed_offsets(self) -> dict:
        """Checkpoint offsets committed atomically with the last snapshot."""
        return self.metadata().get("offsets", {})

    # ------------------------------------------------------------- init
    def init(self, schema: T.StructType, offsets: dict | None = None) -> None:
        """Create version 0: an empty snapshot."""
        os.makedirs(self.path, exist_ok=True)
        full = T.StructType(
            list(schema.fields)
            + [
                T.StructField(META_LSN, T.LongType(), True),
                T.StructField(META_DELETED, T.BooleanType(), True),
            ]
        )
        data_dir = f"snap-{0:06d}"
        self.spark.createDataFrame([], schema=full).write.mode("overwrite").parquet(
            os.path.join(self.path, data_dir)
        )
        self._commit(
            0, schema, data_dir, offsets or {}, row_count=0, parent=None,
            mode=self._init_mode, deltas=[],
        )

    # ------------------------------------------------------------- read
    def _read_padded(self, data_dir: str, want: T.StructType) -> DataFrame:
        """One data dir, padded to schema ``want`` (late-added columns
        read as nulls, Iceberg-style) with meta columns last."""
        df = self.spark.read.parquet(os.path.join(self.path, data_dir))
        # _conform also casts files written before a widening promotion
        # (int32 base files under an int64 evolved schema)
        df = _conform(df, want)
        return df.select([f_.name for f_ in want.fields] + META_COLS)

    def read(self, include_meta: bool = False, version: int | None = None) -> DataFrame:
        """Current (or pinned-version) table contents.

        Live rows only unless ``include_meta``. In ``mor`` mode the
        per-key max-``_lsn`` winner is resolved across base + deltas at
        scan time (one window over a key-hash shuffle — the read-side
        cost MoR trades for O(slice) writes)."""
        meta = self.metadata(version)
        # the PINNED version's schema — time-travel must not show columns
        # added after that snapshot (round-1 verdict item 7)
        want = T.StructType.fromJson(meta["schema"])
        df = self._read_padded(meta["data_dir"], want)
        deltas = meta.get("deltas", [])
        if deltas:
            for d in deltas:
                df = df.unionByName(self._read_padded(d, want))
            w = Window.partitionBy(*KEY_COLS).orderBy(F.col(META_LSN).desc())
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if include_meta:
            return df.select([f_.name for f_ in want.fields] + META_COLS)
        return df.filter(~F.coalesce(F.col(META_DELETED), F.lit(False))).select(
            [f_.name for f_ in want.fields]
        )

    def read_keys(
        self,
        keys: list[tuple],
        include_meta: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """Bucket-pruned point lookup: the rows for an explicit list of
        ``(conv_id, turn_idx)`` keys, reading ONLY the parquet files
        whose hash bucket can contain them.

        Every snapshot/delta dir is written with
        ``repartition(n_buckets, *KEY_COLS)`` — Spark's HashPartitioning
        places a row in partition ``pmod(murmur3(keys), n_buckets)`` and
        the ``part-NNNNN-*`` file prefix IS that partition index. The
        same function is available as a Column (``pmod(hash(...), n)``),
        so the reader computes each key's bucket with a literal-only
        one-row job (no scan) and opens one file per (bucket, dir)
        instead of the whole table: O(dirs × distinct_buckets) files —
        at 10^10 rows a point lookup touches ``1 + n_deltas`` files, not
        ``n_buckets × (1 + n_deltas)``. This is Iceberg's
        bucket-transform partition pruning, driven from the commit
        metadata (``n_buckets`` is recorded there by the writer).

        Semantics match ``read(...).filter(keys)`` exactly: per-key
        max-``_lsn`` winner across base + deltas, tombstones dropped
        unless ``include_meta``. Intended for bounded key lists (the
        filter is a literal OR over the keys); for a large keyset join
        against ``read()`` instead.
        """
        if not keys:
            raise ValueError("read_keys requires at least one key tuple")
        meta = self.metadata(version)
        want = T.StructType.fromJson(meta["schema"])
        n_buckets = meta.get("n_buckets", self.n_buckets)
        by_name = {f_.name: f_ for f_ in want.fields}
        key_schema = T.StructType([by_name[k] for k in KEY_COLS])
        # buckets via Spark's own hash partitioning function, over values
        # cast to the TABLE's key types (murmur3 of int32 != int64)
        kdf = self.spark.createDataFrame(keys, schema=key_schema)
        buckets = sorted(
            r[0]
            for r in kdf.select(
                F.pmod(F.hash(*KEY_COLS), F.lit(n_buckets))
            ).distinct().collect()
        )
        key_filter = None
        for kt in keys:
            cond = None
            for k, v in zip(KEY_COLS, kt):
                c = F.col(k).eqNullSafe(F.lit(v))
                cond = c if cond is None else cond & c
            key_filter = cond if key_filter is None else key_filter | cond

        def _read_pruned(data_dir: str) -> DataFrame | None:
            paths = []
            # glob.escape the directory part: a table path containing
            # glob metacharacters ('[', '?', '*') would otherwise match
            # nothing and silently return empty lookups (r5 review)
            base = glob.escape(os.path.join(self.path, data_dir))
            for b in buckets:
                paths.extend(
                    glob.glob(os.path.join(base, f"part-{b:05d}-*.parquet"))
                )
            if not paths:
                return None  # all matching buckets empty in this dir
            df = _conform(self.spark.read.parquet(*paths), want)
            return df.select(
                [f_.name for f_ in want.fields] + META_COLS
            ).filter(key_filter)

        parts = [
            p
            for p in [_read_pruned(meta["data_dir"])]
            + [_read_pruned(d) for d in meta.get("deltas", [])]
            if p is not None
        ]
        if not parts:
            df = self.spark.createDataFrame(
                [],
                schema=T.StructType(
                    list(want.fields)
                    + [
                        T.StructField(META_LSN, T.LongType(), True),
                        T.StructField(META_DELETED, T.BooleanType(), True),
                    ]
                ),
            )
        else:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            w = Window.partitionBy(*KEY_COLS).orderBy(F.col(META_LSN).desc())
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if include_meta:
            return df.select([f_.name for f_ in want.fields] + META_COLS)
        return df.filter(~F.coalesce(F.col(META_DELETED), F.lit(False))).select(
            [f_.name for f_ in want.fields]
        )

    CHANGE_TYPE = "_change_type"

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        _force_diff: bool = False,
    ) -> DataFrame:
        """Net row-level changes between two committed snapshots — the
        incremental-consumption / CDC-out surface (Iceberg
        ``table_changes`` / Delta Change Data Feed analog): downstream
        consumers tail the lake table itself instead of the upstream
        change log. One row per key whose LIVE state differs between
        ``from_version`` and ``to_version`` (default: current), with
        ``_change_type`` in ``('insert', 'update', 'delete')``.

        Insert/update rows carry the TO-side postimage payload and its
        ``_lsn``; delete rows carry the last-known FROM-side payload
        (the preimage) and the tombstone's ``_lsn`` (null when
        compaction already dropped the tombstone). Columns are presented
        under the TO version's schema — late-added columns read as null
        on pre-evolution rows, consistent with :meth:`read`. Replayed /
        stale slices inside the range produce NO change rows (their LSNs
        lose to the from-state), mirroring the merge's idempotence.

        Scale shape — two plans, picked from the metadata alone:

        * **delta fast path** (``mor`` and no compaction/base rewrite in
          ``(from, to]``, detected as data_dir unchanged + delta-list
          prefix): scans ONLY the delta dirs committed in the range,
          winner-resolves them (one window over the key shuffle,
          O(range deltas)), and probes the from-snapshot once with a
          join to classify insert-vs-update and drop stale replays —
          output and shuffle cost are O(changed keys), never O(table).
        * **snapshot diff fallback** (cow, or the range crosses a
          compaction): full-outer join of the two resolved states on the
          key — correct for ANY pair of retained versions.

        Both versions' metadata must still be retained
        (``expire_snapshots`` removes old versions); otherwise raises
        ``SnapshotExpiredError`` (a ``ValueError`` subclass — distinct
        from the plain ``ValueError`` a ``from_version > to_version``
        range error raises, so callers can bootstrap/rebuild on expiry
        without swallowing range errors).
        """
        if to_version is None:
            to_version = self.current_version()
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} > to_version {to_version}"
            )
        try:
            m_from = self.metadata(from_version)
            m_to = self.metadata(to_version)
        except FileNotFoundError as e:
            raise SnapshotExpiredError(
                f"version metadata missing (expired by expire_snapshots?): {e}"
            ) from None
        want = T.StructType.fromJson(m_to["schema"])
        payload_cols = [f_.name for f_ in want.fields if f_.name not in KEY_COLS]
        out_fields = (
            KEY_COLS
            + payload_cols
            + [self.CHANGE_TYPE, META_LSN]
        )

        if from_version == to_version:
            empty = T.StructType(
                [f_ for f_ in want.fields if f_.name in KEY_COLS]
                + [f_ for f_ in want.fields if f_.name in payload_cols]
                + [
                    T.StructField(self.CHANGE_TYPE, T.StringType(), False),
                    T.StructField(META_LSN, T.LongType(), True),
                ]
            )
            return self.spark.createDataFrame([], schema=empty)

        from_deltas = m_from.get("deltas", [])
        to_deltas = m_to.get("deltas", [])
        new_deltas = (
            to_deltas[len(from_deltas):]
            if (
                not _force_diff
                and m_to["mode"] == "mor"
                and m_to["data_dir"] == m_from["data_dir"]
                and to_deltas[: len(from_deltas)] == from_deltas
            )
            else None
        )

        def _pad_to_want(df: DataFrame) -> DataFrame:
            return _conform(df, want).select(
                [f_.name for f_ in want.fields] + META_COLS
            )

        dead = lambda side: F.coalesce(  # noqa: E731 — local predicate
            F.col(f"{side}.{META_DELETED}"), F.lit(False)
        )
        if new_deltas is not None:
            if not new_deltas:
                return self.read_changes(from_version, from_version)
            delta = self._read_padded(new_deltas[0], want)
            for d in new_deltas[1:]:
                delta = delta.unionByName(self._read_padded(d, want))
            w = Window.partitionBy(*KEY_COLS).orderBy(F.col(META_LSN).desc())
            winner = (
                delta.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            prior = _pad_to_want(
                self.read(include_meta=True, version=from_version)
            )
            j = winner.alias("s").join(
                prior.alias("t"),
                [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in KEY_COLS],
                "left",
            )
            prior_live = F.col(f"t.{META_LSN}").isNotNull() & ~dead("t")
            newer = F.col(f"t.{META_LSN}").isNull() | (
                F.col(f"s.{META_LSN}") > F.col(f"t.{META_LSN}")
            )
            change = (
                F.when(~newer, F.lit(None))  # stale replay → no net change
                .when(dead("s") & prior_live, F.lit("delete"))
                .when(dead("s"), F.lit(None))  # dead → dead
                .when(prior_live, F.lit("update"))
                .otherwise(F.lit("insert"))
            )
            out = j.select(
                *[F.col(f"s.{k}").alias(k) for k in KEY_COLS],
                *[
                    F.when(change == "delete", F.col(f"t.{c}"))
                    .otherwise(F.col(f"s.{c}"))
                    .alias(c)
                    for c in payload_cols
                ],
                change.alias(self.CHANGE_TYPE),
                F.col(f"s.{META_LSN}").alias(META_LSN),
            )
            return out.filter(F.col(self.CHANGE_TYPE).isNotNull()).select(out_fields)

        fr = _pad_to_want(self.read(include_meta=True, version=from_version))
        tt = _pad_to_want(self.read(include_meta=True, version=to_version))
        j = fr.alias("t").join(
            tt.alias("s"),
            [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in KEY_COLS],
            "full_outer",
        )
        fr_live = F.col(f"t.{META_LSN}").isNotNull() & ~dead("t")
        tt_live = F.col(f"s.{META_LSN}").isNotNull() & ~dead("s")
        change = (
            F.when(
                tt_live
                & fr_live
                & (F.col(f"s.{META_LSN}") != F.col(f"t.{META_LSN}")),
                F.lit("update"),
            )
            .when(tt_live & ~fr_live, F.lit("insert"))
            .when(fr_live & ~tt_live, F.lit("delete"))
            .otherwise(F.lit(None))
        )
        out = j.select(
            *[
                F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k)
                for k in KEY_COLS
            ],
            *[
                F.when(change == "delete", F.col(f"t.{c}"))
                .otherwise(F.col(f"s.{c}"))
                .alias(c)
                for c in payload_cols
            ],
            change.alias(self.CHANGE_TYPE),
            # delete: the TO-side tombstone's LSN when retained (null
            # after compaction dropped it); insert/update: the TO LSN.
            F.col(f"s.{META_LSN}").alias(META_LSN),
        )
        return out.filter(F.col(self.CHANGE_TYPE).isNotNull()).select(out_fields)

    # ------------------------------------------------------------ merge
    def merge_apply(self, batch: DataFrame, offsets: dict, retries: int = 2) -> dict:
        """MERGE a deduplicated change batch into the table, retrying on
        commit conflicts.

        A :class:`CommitConflictError` means a concurrent writer
        published (or claimed) our version slot; each retry recomputes
        from fresh table state (new version, evolved schema, their
        committed rows visible), so the merge lands correctly ON TOP of
        the racing commit — the batch itself is deterministic input and
        the merge idempotent, making blind retry safe. After ``retries``
        failed attempts (a LIVE writer squatting the slot, e.g. a
        stuck claim that is not yet stale) the conflict propagates.
        See :meth:`_merge_apply_once` for the merge semantics.
        """
        for attempt in range(retries + 1):
            try:
                return self._merge_apply_once(batch, offsets)
            except CommitConflictError:
                if attempt == retries:
                    raise

    def commit_offsets(self, offsets: dict, retries: int = 2) -> dict:
        """Advance the committed offsets WITHOUT touching data: a
        metadata-only snapshot reusing the current data/delta dirs.

        The replay loop uses this to persist the high-water mark over a
        TRAILING run of provably-empty gap slices (r5 final review:
        with ``max_slices`` set, an LSN gap wider than the slice budget
        would otherwise re-plan the same gap slices on every invocation
        — zero progress, a livelock). Retries like :meth:`merge_apply`:
        each attempt re-reads fresh metadata, so a racing writer's
        commit is simply re-based on."""
        for attempt in range(retries + 1):
            meta = self.metadata()
            # never REWIND the high-water mark: a racing writer (or the
            # rebase after its conflict) may already have committed a
            # newer lsn_hi — advancing offsets is monotone
            cur_hi = int(meta.get("offsets", {}).get("lsn_hi", -1))
            if int(offsets.get("lsn_hi", -1)) <= cur_hi:
                return {"version": meta["version"],
                        "row_count": meta.get("row_count"), "noop": True}
            try:
                self._commit(
                    meta["version"] + 1,
                    T.StructType.fromJson(meta["schema"]),
                    meta["data_dir"],
                    offsets,
                    row_count=meta.get("row_count"),
                    parent=meta["version"],
                    mode=meta.get("mode", "cow"),
                    deltas=meta.get("deltas", []),
                )
                return {"version": meta["version"] + 1,
                        "row_count": meta.get("row_count")}
            except CommitConflictError:
                if attempt == retries:
                    raise

    def _merge_apply_once(self, batch: DataFrame, offsets: dict) -> dict:
        """MERGE a deduplicated change batch into the table.

        ``batch`` must have exactly one row per key — the max-LSN winner
        from ``operators.dedup`` — with columns
        ``(lsn, op, <keys>, <payload...>)``. Semantics per row, vs the
        current target row for the same key (if any):

        * incoming ``lsn`` <= stored ``_lsn`` → keep the target row
          (replay / out-of-order slice → no-op: idempotence);
        * newer + op in (I, U) → upsert the payload (U on a missing key
          inserts, like ``MERGE ... WHEN NOT MATCHED THEN INSERT``);
        * newer + op = D → tombstone the key (kept with
          ``_deleted=true`` so an even-later replayed slice still sees
          the LSN high-water mark).

        Schema evolution happens first: payload columns absent from the
        table schema are appended. Returns commit statistics.
        """
        if not self.exists():
            raise RuntimeError(f"target table at {self.path} not initialized")

        # ONE metadata read pins EVERYTHING this merge derives from —
        # schema basis, read snapshot, delta list, and the commit slot
        # (base version + 1). Re-reading current_version() at commit
        # time was a lost-update TOCTOU (r4 core review): a writer that
        # committed between our state read and our slot computation
        # would be silently overwritten instead of conflicting. With
        # the slot pinned to the SNAPSHOT WE READ, any racing commit
        # takes our slot first and the O_EXCL claim raises
        # CommitConflictError -> merge_apply retries from fresh state.
        base_meta = self.metadata()
        cur_schema = T.StructType.fromJson(base_meta["schema"])
        # key columns NEVER evolve implicitly (ADVICE r2): a batch whose
        # key type differs from the table's — wider (long turn_idx vs
        # int) or narrower — fails loudly instead of being silently cast
        # by _conform, where a down-cast could collapse distinct keys.
        cur_types = {f_.name: f_.dataType for f_ in cur_schema.fields}
        for f_ in batch.schema.fields:
            if f_.name in KEY_COLS and f_.dataType != cur_types.get(f_.name):
                raise SchemaConflictError(
                    f"key column {f_.name!r}: batch type "
                    f"{f_.dataType.simpleString()} != table type "
                    f"{cur_types[f_.name].simpleString()}; key types are "
                    "fixed at init and never evolve implicitly"
                )
        batch_payload = [
            c for c in batch.columns
            if c not in ("lsn", "op") and c not in META_COLS
            and c not in KEY_COLS
        ]
        new_fields = [
            f_ for f_ in batch.schema.fields
            if f_.name in batch_payload and f_.name not in cur_schema.fieldNames()
        ]
        # widen existing columns when the batch carries a safely-wider
        # type (int→long, float→double, Iceberg's promotion rules); a
        # NARROWER batch type (old epoch replayed after widening) keeps
        # the table's wide type and the batch is cast up at write time.
        batch_types = {f_.name: f_.dataType for f_ in batch.schema.fields}
        evolved_existing = [
            T.StructField(f_.name, _wider(f_.dataType, batch_types[f_.name]), True)
            if f_.name in batch_payload
            and batch_types[f_.name] != f_.dataType
            else f_
            for f_ in cur_schema.fields
        ]
        evolved = T.StructType(
            evolved_existing
            + [T.StructField(f_.name, f_.dataType, True) for f_ in new_fields]
        )

        if base_meta.get("mode", "cow") == "mor":
            return self._merge_mor(batch, evolved, offsets, base_meta)

        # read pinned to the SAME snapshot the commit slot is derived from
        tgt = self.read(include_meta=True, version=base_meta["version"])
        # pad missing columns and cast widened ones (both the stored side
        # and an old-epoch batch may be narrower than the evolved schema)
        tgt = _conform(tgt, evolved)
        src = _conform(batch, evolved)

        payload_cols = [f_.name for f_ in evolved.fields if f_.name not in KEY_COLS]

        t = tgt.alias("t")
        s = src.alias("s")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in KEY_COLS]
        joined = t.join(s, cond, "full_outer")

        take_src = F.col("s.lsn").isNotNull() & (
            F.col(f"t.{META_LSN}").isNull() | (F.col("s.lsn") > F.col(f"t.{META_LSN}"))
        )
        out_cols = [
            F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in KEY_COLS
        ]
        out_cols += [
            F.when(take_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in payload_cols
        ]
        out_cols += [
            F.when(take_src, F.col("s.lsn"))
            .otherwise(F.col(f"t.{META_LSN}"))
            .alias(META_LSN),
            F.when(take_src, F.col("s.op") == F.lit("D"))
            .otherwise(F.coalesce(F.col(f"t.{META_DELETED}"), F.lit(False)))
            .alias(META_DELETED),
        ]
        merged = joined.select(out_cols)

        version = base_meta["version"] + 1
        data_dir = f"snap-{version:06d}-{uuid.uuid4().hex[:8]}"
        out_path = os.path.join(self.path, data_dir)
        # Hash-cluster files on the key (emulating Iceberg bucket
        # partitioning) so downstream reads are co-located.
        # Live-row count rides the write via Observation (no extra job);
        # row_count in metadata is LIVE rows (tombstones excluded), the
        # same semantic as a MoR compaction commit.
        from pyspark.sql import Observation

        obs = Observation()
        merged = merged.observe(
            obs,
            F.sum(
                F.when(~F.coalesce(F.col(META_DELETED), F.lit(False)), 1).otherwise(0)
            ).alias("live"),
        )
        merged.repartition(self.n_buckets, *KEY_COLS).write.option(
            "compression", PARQUET_CODEC
        ).mode("overwrite").parquet(
            out_path
        )
        # _observed_live: AQE can eliminate the CollectMetrics node on an
        # empty plan (the failure compact() and stream_runner hit) — the
        # helper falls back to counting the written files
        row_count = self._observed_live(obs, out_path)
        self._commit(
            version, evolved, data_dir, offsets,
            row_count=row_count, parent=version - 1,
            mode="cow", deltas=[],
        )
        return {"version": version, "row_count": row_count, "data_dir": data_dir}

    def _merge_mor(
        self, batch: DataFrame, evolved: T.StructType, offsets: dict,
        meta: dict,
    ) -> dict:
        """Merge-on-read apply: append the deduped batch as a delta file
        set (hash-clustered on the key, like the base); O(slice) write
        cost regardless of table size. Winner resolution happens at read
        time; compaction folds deltas into the base every
        ``compact_threshold`` commits. ``meta`` is the SAME metadata
        snapshot the caller derived the schema from — the commit slot is
        meta["version"]+1 so a racing writer conflicts instead of having
        its delta silently dropped from the list (r4 core review)."""
        src = _conform(batch, evolved)
        delta_rows = (
            src.select(
                *[F.col(f_.name) for f_ in evolved.fields],
                F.col("lsn").alias(META_LSN),
                (F.col("op") == F.lit("D")).alias(META_DELETED),
            )
        )
        version = meta["version"] + 1
        delta_dir = f"delta-{version:06d}-{uuid.uuid4().hex[:8]}"
        out_path = os.path.join(self.path, delta_dir)
        delta_rows.repartition(self.n_buckets, *KEY_COLS).write.option(
            "compression", PARQUET_CODEC
        ).mode("overwrite").parquet(out_path)
        deltas = meta.get("deltas", []) + [delta_dir]
        self._commit(
            version, evolved, meta["data_dir"], offsets,
            row_count=None, parent=version - 1,
            mode="mor", deltas=deltas,
        )
        stats = {"version": version, "row_count": None, "data_dir": meta["data_dir"],
                 "n_deltas": len(deltas)}
        if len(deltas) >= self.compact_threshold:
            try:
                stats = self.compact()
            except CommitConflictError:
                # the merge itself committed fine; a racing maintainer
                # beat us to the compaction slot — theirs covers ours
                pass
        return stats

    def compact(
        self,
        drop_tombstones: bool | None = None,
        allow_unordered_drop: bool = False,
    ) -> dict:
        """Fold all deltas into a new base snapshot (MoR maintenance);
        on a cow table, act as the tombstone VACUUM (full sorted rewrite
        dropping ``_deleted`` rows — without it a delete-heavy cow table
        carries its dead rows into every subsequent full rewrite
        forever).

        ``drop_tombstones`` defaults to ``self.ordered_commits``:
        dropping a tombstone is only safe when nothing older than it can
        ever be committed later (see class docstring); out-of-order
        writers (file-source streaming) must retain them. An EXPLICIT
        ``True`` on a table whose metadata records
        ``ordered_commits=False`` is refused (r5 review: maintain_job's
        explicit bool silently bypassed the recorded guarantee, and a
        later lower-LSN delivery would resurrect the deleted row) —
        pass ``allow_unordered_drop=True`` only when the out-of-order
        source is decommissioned and no stale delivery can ever arrive.

        An explicit ``drop_tombstones=True`` on a MoR table with zero
        pending deltas still rewrites the base (the vacuum request —
        base-resident tombstones have no other exit); the no-delta
        early-return applies only to the implicit maintenance call."""
        explicit_drop = drop_tombstones is True
        if drop_tombstones is None:
            drop_tombstones = self.ordered_commits
        if drop_tombstones and not self.ordered_commits and not allow_unordered_drop:
            raise ValueError(
                f"table {self.path} records ordered_commits=False: dropping "
                "tombstones could resurrect deleted rows when an older-LSN "
                "delivery arrives later. Retain them, or pass "
                "allow_unordered_drop=True if the out-of-order source is "
                "decommissioned."
            )
        meta = self.metadata()
        table_mode = meta.get("mode", "cow")
        if table_mode == "mor" and not meta.get("deltas") and not explicit_drop:
            return {"version": meta["version"], "row_count": meta.get("row_count"),
                    "data_dir": meta["data_dir"], "n_deltas": 0}
        if table_mode == "cow" and not drop_tombstones:
            # nothing to fold on a cow table; the only compaction work
            # is the tombstone vacuum (cow merges retain tombstones so
            # each MERGE keeps the row-level replay guard — maintenance
            # reclaims them under the same ordered-commits argument the
            # MoR drop uses, r4 core review)
            return {"version": meta["version"], "row_count": meta.get("row_count"),
                    "data_dir": meta["data_dir"], "n_deltas": 0}
        schema = T.StructType.fromJson(meta["schema"])
        resolved = self.read(include_meta=True, version=meta["version"])
        if drop_tombstones:
            resolved = resolved.filter(
                ~F.coalesce(F.col(META_DELETED), F.lit(False))
            )
        version = meta["version"] + 1
        data_dir = f"snap-{version:06d}-{uuid.uuid4().hex[:8]}"
        out_path = os.path.join(self.path, data_dir)
        from pyspark.sql import Observation

        obs = Observation()
        resolved = resolved.observe(
            obs,
            F.sum(
                F.when(~F.coalesce(F.col(META_DELETED), F.lit(False)), 1).otherwise(0)
            ).alias("live"),
        )
        # compaction is already a full rewrite, so key-sort each bucket
        # file for free-ish: parquet row-group min/max on conv_id become
        # tight, and every point/range read after compaction prunes row
        # groups instead of scanning the bucket (delta writes stay
        # UNSORTED — the hot path pays no sort; sorting is amortized
        # into maintenance, the Iceberg rewrite-with-sort-order pattern)
        resolved.repartition(self.n_buckets, *KEY_COLS).sortWithinPartitions(
            *KEY_COLS
        ).write.option(
            "compression", PARQUET_CODEC
        ).mode("overwrite").parquet(
            out_path
        )
        row_count = self._observed_live(obs, out_path)
        self._commit(
            version, schema, data_dir, meta.get("offsets", {}),
            row_count=row_count, parent=version - 1,
            mode=table_mode, deltas=[],
        )
        return {"version": version, "row_count": row_count, "data_dir": data_dir,
                "n_deltas": 0}

    def _observed_live(self, obs, out_path: str) -> int:
        """Live-row count from the write's Observation, with a fallback:
        when the written plan is EMPTY, AQE propagates the empty
        relation through the sort and eliminates the CollectMetrics
        node, so ``obs.get`` raises a JVM assertion instead of returning
        a null metric — re-count from the written files (degenerate
        case, cheap)."""
        try:
            return int(obs.get["live"] or 0)
        except Exception:
            out = self.spark.read.parquet(out_path)
            return out.filter(
                ~F.coalesce(F.col(META_DELETED), F.lit(False))
            ).count()

    def count_live(self) -> int:
        """Exact live-row count (cheap in cow — committed metadata;
        a winner-resolution scan in mor between compactions)."""
        rc = self.metadata().get("row_count")
        if rc is None:
            return self.read().count()
        return rc

    # ----------------------------------------------------------- commit
    def _conflict_if_published(
        self, version: int, cleanup: str | None = None, what: str = ""
    ) -> None:
        """Raise :class:`CommitConflictError` if the pointer already
        names ``version`` or newer, removing ``cleanup`` first.

        The shared check-then-act guard of the commit protocol: under
        flock ownership it is defense-in-depth; under the no-flock
        fallback it is the only protection (narrowed, not closed —
        plain files offer no atomic compare-and-swap)."""
        if self.exists() and self.current_version() >= version:
            if cleanup is not None:
                try:
                    os.remove(cleanup)
                except OSError:
                    pass
            raise CommitConflictError(
                f"version {version} of {self.path} {what}; re-read "
                f"metadata and retry"
            )

    def _commit(
        self,
        version: int,
        schema: T.StructType,
        data_dir: str,
        offsets: dict,
        row_count: int | None,
        parent: int | None,
        mode: str = "cow",
        deltas: list[str] | None = None,
    ) -> None:
        meta = {
            "version": version,
            "schema": schema.jsonValue(),
            "data_dir": data_dir,
            "offsets": offsets,
            "row_count": row_count,
            "parent": parent,
            "mode": mode,
            "deltas": deltas or [],
            # recorded so READERS can bucket-prune (read_keys) without
            # having to be constructed with the writer's n_buckets
            "n_buckets": self.n_buckets,
            # recorded so EVERY writer (incl. maintain_job) inherits the
            # table's ordering guarantee instead of its own default —
            # gates whether compaction may drop tombstones
            "ordered_commits": self.ordered_commits,
        }
        mp = self._meta_path(version)
        # Optimistic concurrency (Iceberg-style CAS): claim the version
        # slot by exclusive creation, then hold a kernel advisory lock
        # (flock) on it from claim through pointer swap. The LOCK is the
        # liveness signal the mtime heuristic alone could not give: a
        # writer killed mid-commit releases it instantly, while an
        # alive-but-stalled writer KEEPS it — so a stale-looking claim
        # whose owner is still running can no longer be taken over and
        # later clobbered by the owner's resume (r5 final review: the
        # check-then-act ``>=`` guards below are not atomic; only the
        # lock closes that window). If the slot exists, either (a) that
        # version is already published (pointer >= version) or its
        # owner is provably live (lock held) or plausibly live (claim
        # younger than the grace period — covers the claimant's
        # create-to-flock window and lock-less filesystems) → conflict,
        # caller must recompute from fresh metadata; or (b) the claim
        # is stale, unlocked and unpublished — a crashed writer's
        # half-commit that nothing references → take it over (this is
        # what makes kill -9/resume work even when the kill lands
        # between claim and publish). Where flock is unavailable the
        # protocol degrades to the pre-r5 grace heuristic and the
        # ``>=`` guards are the only — narrowed, not closed — defense.
        claim_fd = None
        meta_fd = None
        try:
            fresh = True
            lock = "unsupported"
            try:
                claim_fd = os.open(mp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                if hasattr(os, "fchmod"):  # absent on Windows < 3.13
                    try:
                        # world-readable regardless of umask: another
                        # user's writer must be able to open+flock this
                        # claim for the liveness probe — a 0o700 claim
                        # (umask 0o077) would push cross-user writers
                        # onto the lock-less EACCES degrade below, which
                        # can take over a LIVE stalled owner (review
                        # round 4)
                        os.fchmod(claim_fd, 0o644)
                    except OSError:
                        pass
            except FileExistsError:
                fresh = False
                try:
                    # O_RDONLY, not O_RDWR: flock needs no write access,
                    # and another user's 0644 claim in a shared table
                    # dir would make O_RDWR raise EACCES (review of
                    # this commit)
                    claim_fd = os.open(mp, os.O_RDONLY)
                except FileNotFoundError:
                    # the slot vanished between O_EXCL and this open
                    # (concurrent expire_snapshots, or a loser cleaning
                    # up) — the table is moving under us
                    raise CommitConflictError(
                        f"version {version} of {self.path} is contended; "
                        f"re-read metadata and retry"
                    ) from None
                except PermissionError:
                    # another user's UNREADABLE claim (umask 0o077 makes
                    # O_EXCL create 0o700): the flock liveness probe is
                    # unavailable, but the mtime heuristic below needs
                    # only directory access. Degrade to the pre-lock
                    # protocol for this slot rather than conflicting
                    # forever on a dead owner's claim (review of this
                    # commit — mapping EACCES to a conflict made such a
                    # slot permanently un-takeover-able).
                    claim_fd = None
            if claim_fd is not None:
                lock = _try_flock(claim_fd)
            if lock == "held" and fresh:
                # we CREATED this claim, so the only possible holder is
                # a prober that flocked it inside our create-to-flock
                # window (a takeover needs the claim to be older than
                # the grace period); it will see age < grace, conflict,
                # and release. Wait it out briefly instead of
                # conflicting — otherwise the slot is left
                # claimed-but-ownerless and poisons BOTH writers for
                # claim_grace_secs (review of this commit; the O_EXCL
                # winner must keep its pre-lock always-proceeds
                # property).
                deadline = time.monotonic() + 1.0
                while lock == "held" and time.monotonic() < deadline:
                    time.sleep(0.02)
                    lock = _try_flock(claim_fd)
            if lock == "held":
                if fresh:
                    # the holder outlasted the wait. If the claim is
                    # still YOUNGER than the grace period no takeover
                    # can have passed the age gate, so the holder can
                    # only be a stuck prober that will never publish —
                    # remove our own claim so the slot doesn't sit
                    # claimed-but-ownerless for the rest of the grace
                    # period (review of this commit). If it is already
                    # older (we stalled past grace before flocking), the
                    # holder may be a legitimate takeover writer
                    # mid-publish — leave the slot alone. BOTH gates are
                    # checked against the inode WE created (review round
                    # 4): after a taker's os.replace, mp's mtime is the
                    # fresh PUBLISH time — young alone would then remove
                    # the taker's published metadata. Same-inode ∧ young
                    # means the mtime is our creation time, so no taker
                    # can have passed the age gate, and none can be
                    # mid-replace. Residual (review round 5, accepted):
                    # the inode is re-checked immediately before the
                    # unlink, but stat→unlink is still two syscalls — a
                    # stall between them that ALSO outlasts the
                    # remaining grace, combined with a lock-less taker,
                    # could remove a publish; plain files offer no
                    # unlink-if-inode-matches to close that.
                    try:
                        st = os.stat(mp)
                        ours = os.fstat(claim_fd).st_ino == st.st_ino
                        young = (
                            time.time() - st.st_mtime
                        ) < self.claim_grace_secs
                    except OSError:
                        ours = young = False
                    if ours and young and _claim_is_current(claim_fd, mp):
                        try:
                            os.remove(mp)
                        except OSError:
                            pass
                # a LIVE writer owns this slot: never take over a
                # living writer — conflicting here (even past the grace
                # period) is what makes the stalled-writer clobber
                # unreachable.
                raise CommitConflictError(
                    f"version {version} of {self.path} is being committed "
                    f"by a live writer; re-read metadata and retry"
                )
            if claim_fd is not None:
                # Revalidate that the claimed fd's inode is still the
                # slot path — in BOTH branches. Prober side: the claim
                # we opened may have been replaced or removed while we
                # raced here, leaving our lock on an ORPHANED inode
                # while another writer holds the CURRENT one — two
                # simultaneous "owners" and the clobber race returns.
                # Creator side: a creator that stalled past the grace
                # period between O_EXCL and flock can resume AFTER a
                # takeover writer republished the path; without this
                # check the expired-slot cleanup below would os.remove
                # the taker's PUBLISHED v{version}.json that _current
                # references — destroying an acknowledged commit
                # (review of this commit).
                if not _claim_is_current(claim_fd, mp):
                    raise CommitConflictError(
                        f"version {version} of {self.path} slot changed "
                        f"under its claim; re-read metadata and retry"
                    )
            if fresh:
                # the O_EXCL claim can SUCCEED on a slot whose published
                # metadata expire_snapshots already deleted — a stale
                # writer (base read minutes ago, table since advanced
                # past `version` and expired it) would otherwise proceed
                # and REWIND the pointer, silently discarding every newer
                # commit (r5 review). The pointer is the commit truth,
                # not the slot file: re-check it after claiming. No
                # cleanup of mp here (review round 4): between the inode
                # revalidation above and a remove, a lock-less
                # (EACCES-degraded or no-flock-FS) taker could republish
                # mp — removing would destroy its acknowledged metadata.
                # The cost of NOT removing is one inert empty claim file
                # at a below-pointer version nobody will ever target
                # again (version numbers are monotone; ``versions()``
                # skips empty files).
                self._conflict_if_published(
                    version,
                    what="was already published and expired; this "
                         "writer's base snapshot is stale",
                )
            else:
                self._conflict_if_published(
                    version, what="was committed by another writer"
                )
                try:
                    age = time.time() - os.path.getmtime(mp)
                except OSError:
                    # the claim vanished under us (a loser's cleanup or
                    # concurrent expire) — retryable, not a crash
                    # (review of this commit: getmtime on a removed
                    # claim raised FileNotFoundError out of the
                    # protocol)
                    raise CommitConflictError(
                        f"version {version} of {self.path} is contended; "
                        f"re-read metadata and retry"
                    ) from None
                if age < self.claim_grace_secs:
                    raise CommitConflictError(
                        f"version {version} of {self.path} is being "
                        f"committed by another writer; re-read metadata "
                        f"and retry"
                    )
                # else: stale, unlocked, unpublished → orphaned claim of
                # a crashed writer; we now hold its lock → take it over
            # UNIQUE temp names: under the no-flock fallback two writers
            # can both proceed, and a SHARED .tmp path would let one
            # truncate the inode the other is mid-write on — torn JSON
            # published by os.replace (r4 core review)
            tmp = f"{mp}.{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f, indent=1, sort_keys=True)
            # Lock the inode that is ABOUT to become v{version}.json:
            # os.replace swaps mp to this new inode and the claim lock
            # stays on the OLD one, so without this a takeover attempt
            # arriving between our metadata replace and pointer swap
            # would flock the new inode, succeed, and proceed against a
            # slot whose owner is still mid-publish.
            meta_fd = os.open(tmp, os.O_RDWR)
            _try_flock(meta_fd)
            # Re-check BEFORE replacing the metadata file: under the
            # no-flock fallback a writer stalled past claim_grace_secs
            # may have had its slot taken over AND fully published by
            # another writer — replacing that winner's v{version}.json
            # with ours would silently drop its acknowledged deltas even
            # though we then lose the pointer race (r5 final review; the
            # post-replace `>` check missed the exactly-equal case).
            # With flock held this is unreachable; it stays as the only
            # guard for lock-less filesystems.
            self._conflict_if_published(
                version, cleanup=tmp,
                what="was published by a takeover writer while this "
                     "commit was stalled",
            )
            os.replace(tmp, mp)
            ptmp = f"{self._pointer}.{uuid.uuid4().hex[:8]}.tmp"
            with open(ptmp, "w") as f:
                f.write(str(version))
            # never move the pointer BACKWARD or sideways: under the
            # no-flock fallback a racing writer may have published
            # `version` itself or a newer one between our claim and here
            # (both sides of a stale-claim takeover proceeding) — `>=`,
            # not `>`: current == version means the takeover writer won
            # and our swap would re-point to OUR metadata, dropping its
            # committed deltas. With flock held a loser here is
            # unreachable (newer versions can only follow OUR pointer
            # swap). The real backend (an Iceberg catalog) makes this a
            # true CAS.
            self._conflict_if_published(
                version, cleanup=ptmp,
                what="was overtaken by a newer published version before "
                     "its pointer swap",
            )
            os.replace(ptmp, self._pointer)  # THE atomic commit point
        finally:
            # closing the fds releases both locks — AFTER the pointer
            # swap, so the slot is owned for the full claim→publish span
            for fd in (claim_fd, meta_fd):
                if fd is not None:
                    try:
                        os.close(fd)
                    except OSError:
                        pass

    # ---------------------------------------------------------- history
    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            if name.startswith("v") and name.endswith(".json"):
                # skip claim placeholders (empty files): they are
                # in-flight commits, not published versions. A file
                # removed between listdir and stat (concurrent
                # expire_snapshots — r5 review) is simply gone.
                try:
                    if os.path.getsize(os.path.join(self.path, name)) == 0:
                        continue
                except FileNotFoundError:
                    continue
                out.append(int(name[1:-5]))
        return sorted(out)

    def expire_snapshots(
        self, keep_last: int = 2, orphan_grace_secs: float | None = None
    ) -> None:
        """Drop metadata of all but the newest snapshots, then delete any
        data/delta dirs no kept snapshot references (MoR versions share
        the base and earlier deltas, so removal is by reference count,
        exactly like Iceberg's expire-snapshots + orphan-file cleanup).

        An unreferenced dir younger than ``orphan_grace_secs`` (default:
        the table's setting) is SKIPPED: a concurrent writer stages its
        data dir before committing, so a fresh "orphan" may be an
        in-flight merge — deleting it would corrupt that commit."""
        if orphan_grace_secs is None:
            orphan_grace_secs = self.orphan_grace_secs
        # a CONCURRENT expirer (replay loop expires per slice while a
        # cron maintain_job --expire-keep runs) may remove version
        # metadata between our listing and our access — losing the race
        # is fine, crashing the replay run mid-backlog is not (r5
        # review). But a KEPT version whose metadata vanished must NOT
        # be treated as "references nothing": its dirs may be the live
        # MoR base shared by newer snapshots, and sweeping them would
        # delete live table data (r5 final review). Re-list and retry
        # until one pass reads every kept snapshot consistently; if
        # that never happens, drop only our planned metadata and SKIP
        # the orphan sweep — the next expire picks the garbage up.
        referenced: set | None = None
        drop: list = []
        for _attempt in range(5):
            vs = self.versions()
            cur = self.current_version()
            drop = [v for v in vs[:-keep_last] if v != cur]
            keep = [v for v in vs if v not in drop]
            refs = set()
            consistent = True
            for v in keep:
                try:
                    m = self.metadata(v)
                except FileNotFoundError:
                    consistent = False  # racing expirer → re-list
                    break
                refs.add(m["data_dir"])
                refs.update(m.get("deltas", []))
            if consistent:
                referenced = refs
                break
        for v in drop:
            try:
                os.remove(self._meta_path(v))
            except FileNotFoundError:
                pass
        # Reap inert EMPTY claims at or below the published pointer
        # (review round 5): the expired-slot conflict path deliberately
        # leaves its empty claim behind (removing it raced a lock-less
        # taker's republish), and nothing else reclaimed them —
        # versions() skips empty files, so the drop list above never
        # contains one, and a table whose writers repeatedly hit the
        # stale-base conflict would grow one permanent file per
        # conflict. An empty claim with version <= pointer can never be
        # republished — the pre-replace pointer guard conflicts any
        # holder before its os.replace — so once its flock is free it
        # is pure litter; a held lock (live claimant about to conflict)
        # defers it to the next expire.
        ptr = self.current_version()
        for name in os.listdir(self.path):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            try:
                ver = int(name[1:-5])
            except ValueError:
                continue
            if ver > ptr:
                continue  # an in-flight claim for a future version
            p = os.path.join(self.path, name)
            fd = None
            try:
                if os.path.getsize(p) != 0:
                    continue
                fd = os.open(p, os.O_RDONLY)
                # _claim_is_current: the probe's lock lives on the
                # OPENED inode — if the path was reaped by a racing
                # expirer and re-created (O_EXCL) by a new claimant
                # between our open and here, removing by path would
                # yank that claimant's flock-HELD claim (review round
                # 6; bounded — it conflicts retryably either way — but
                # the held-lock-defers contract should hold)
                if (
                    _try_flock(fd) != "held"
                    and _claim_is_current(fd, p)
                    and os.fstat(fd).st_size == 0
                ):
                    os.remove(p)
            except OSError:
                pass
            finally:
                if fd is not None:
                    try:
                        os.close(fd)
                    except OSError:
                        pass
        if referenced is None:
            return
        now = time.time()
        for name in os.listdir(self.path):
            if (
                (name.startswith("snap-") or name.startswith("delta-"))
                and name not in referenced
            ):
                p = os.path.join(self.path, name)
                try:
                    if now - os.path.getmtime(p) < orphan_grace_secs:
                        continue
                except OSError:
                    continue
                shutil.rmtree(p, ignore_errors=True)
