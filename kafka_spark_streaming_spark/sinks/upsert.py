"""Keyed-upsert sink — the reference's HBase cell model on parquet.

HBase semantics (SURVEY.md §1.1, HbaseWriter.scala:22-31,76-82): a row
is (rowkey, cf, qualifier) → value; writing the same cell again
overwrites it (last-write-wins). The reference offers a single-row put
(S3) and a bulk per-batch put (S4, whose implementation was broken —
driver-side ArrayList mutated on executors; we implement the intent).

Design for scale:
- State lives in versioned parquet dirs `v_{batch_id}`, each
  partitioned by `rb = pmod(xxhash64(rowkey), buckets)` — the parquet
  analogue of the rowkey-range region sharding of the HBase table the
  reference writes through (HbaseWriter.scala:26-29; a hash of the
  key gives the same pruning with none of the range-boundary skew).
  Each batch LWW-merges ONLY the rb partitions its rowkeys touch —
  the prior-state read is partition-pruned (PartitionFilters,
  plan-pinned in tests/test_plans.py::
  test_upsert_merge_prunes_state_partitions) and the merge shuffle
  moves |touched partitions| + |batch| rows, not |state| (VERDICT
  r15 #3: the per-batch one-shuffle-of-|state| was the next shape to
  go if the sink carries volume).  Untouched partitions carry forward
  as MANIFEST ENTRIES (VERDICT r16 #1): every committed version holds
  a `_MANIFEST.json` mapping each live `rb=` partition to the version
  that owns its data, so a new version rewrites only the touched
  partitions' files and inherits the rest as pure metadata — the
  exact file-remapping move of a Delta/Iceberg MERGE, and unlike the
  r16 hard-link carry-forward it works on ANY filesystem (object
  stores have no hard links).  Read fan-out is bounded: when a
  manifest would reference more than
  spark.kss.sink.upsertCompactVersions distinct versions, the next
  write folds ALL live partitions into itself (log-structured
  compaction — amortized one full rewrite every ~threshold batches).
  Bucket count is engine config (spark.kss.sink.upsertStateBuckets —
  config.py has the 100 TB sizing rule).
- Idempotent / exactly-once under foreachBatch retries: a re-run of
  batch N commits a fresh ATTEMPT version `v_N-r{k}` rebuilt from the
  batch_id < N residue of the state (SURVEY.md §7 "what's hard" #4).
  A retry is DETECTED (the committed head's batch is already >=
  batch_id) and triggers a full merge, so even a NON-deterministic
  replay — wall-clock rowkeys landing in different rb buckets than
  the first attempt — purges the first attempt's rows everywhere via
  the batch_id < N filter instead of carrying them forward as ghosts
  in "untouched" partitions (ADVICE r16 upsert.py:205).  Retries are
  rare; the one-off full merge is the cheap price of correctness
  under either clock.  COMMITTED VERSIONS ARE IMMUTABLE (r18): the
  pre-r18 retry rewrote `v_N` in place (rmtree + rename), which
  deleted the files a live snapshot() pin was still reading — the
  attempt suffix makes every commit append-only and leaves the
  superseded attempt to the ordinary prune/pin lifecycle.
- Within-batch collisions on the same cell (the reference's
  epoch-second rowkeys collide routinely, Streamer.scala:163) resolve
  deterministically by max(value) — documented tie-break so tests and
  oracle agree.
- On a real deployment this maps 1:1 onto a Delta/Iceberg MERGE; the
  versioned-parquet variant keeps the harness dependency-free.
- SINGLE WRITER per store path — ENFORCED since r18 (was contract
  only): the sink holds a fenced-writer token (fencing.WriterFence,
  `_WRITER_EPOCH` inside the store), acquired lazily at the sink's
  FIRST write_batch (an attach that only reads never fences a live
  writer out) and re-checked immediately before every commit-point
  mutation (both version renames and the prune's deletions).  Newest
  writer wins: after a failover the new driver's first write bumps
  the epoch, and the zombie's next commit raises StaleWriterError
  instead of interleaving renames — the parquet analogue of the
  HBase region lease the reference leaned on (HbaseWriter.scala's
  puts go through the region holder).  Readers see a consistent
  snapshot (the manifest read pins one immutable head); a LAZY
  current() DataFrame held across later write_batch calls may still
  reference version dirs prune has since deleted — use snapshot()
  for a read that pins its versions against EVERY pruner on the
  host (durable pin files, see PIN_DIR below) for the DataFrame's
  lifetime (same time-travel caveat as any vacuumed table format
  otherwise).
"""

from __future__ import annotations

import os
import shutil
import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_spark_streaming_spark.fencing import WriterFence

CELL_KEY = ["rowkey", "cf", "qualifier"]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("rowkey", T.StringType(), False),
        T.StructField("cf", T.StringType(), False),
        T.StructField("qualifier", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), False),
    ]
)


MANIFEST_NAME = "_MANIFEST.json"

# snapshot() pins are DURABLE since r19: each handed-out snapshot
# writes a `_pins/pin-{pid}-{nonce}.json` file inside the store naming
# the versions its read plan references, and EVERY pruner — any sink
# attach in any process on the host — honors pin files whose holder
# pid is alive (fencing.live_pins).  This closes the r18 caveat that
# pins lived in a process-local registry, so a reader in a DIFFERENT
# process raced vacuum: the post-failover writer in a new driver
# process now sees its fenced predecessor's pins on disk.  Release is
# the same weakref lifecycle as before (the pin file is deleted when
# the snapshot DataFrame is collected), with two crash backstops: a
# holder that dies without releasing leaves a pin whose pid is dead,
# which the next prune deletes; and pid REUSE merely delays pruning
# until the recycled pid exits (pins gate only deletions, never
# correctness).  Multi-host deployments map pid-liveness onto a lease
# TTL exactly like the writer fence (fencing module docstring).
PIN_DIR = "_pins"


# sentinel: "caller did not choose" — distinct from an explicit None
# (pid mode), so drains can force lease mode without stealing the
# conf knob from bare attaches
_LEASE_FROM_CONF = object()


class KeyedUpsertSink:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        lease_ttl_s: float | None | object = _LEASE_FROM_CONF,
    ):
        """``lease_ttl_s``: fence-liveness override for this writer.
        Unset (the default) reads the spark.kss.fence.leaseTtlSec knob
        — pid mode unless configured, the right posture for a BARE
        local attach.  The registered streaming drains pass
        config.drain_fence_lease_ttl(...) to run lease-mode by
        default (VERDICT r19 #5); an explicit None forces pid mode."""
        from kafka_spark_streaming_spark.config import (
            persisted_layout,
            upsert_compact_versions,
            upsert_keep_versions,
            upsert_state_buckets,
        )

        self.spark = spark
        self.path = path
        self._lease_ttl_s = lease_ttl_s
        self.compact_versions = upsert_compact_versions(spark)
        self.keep_versions = upsert_keep_versions(spark)
        os.makedirs(path, exist_ok=True)
        # The bucket count is a property of the STORE, not the
        # session: reopening an rb-partitioned store under a different
        # count would prune the prior read with the wrong pmod and
        # carry stale rows forward as "untouched" — silent LWW
        # corruption (code-review r16).  So the count is persisted in
        # a _BUCKETS marker at attach and every later attach reads the
        # marker; the conf only seeds brand-new stores.
        (self.buckets,) = persisted_layout(
            os.path.join(path, "_BUCKETS"),
            lambda: (upsert_state_buckets(spark),),
            arity=1,
        )
        # writer fence (module docstring): acquired at the FIRST
        # write_batch, not here — attaching to read must not fence a
        # live writer out.
        self._fence: WriterFence | None = None

    def _writer_fence(self) -> WriterFence:
        if self._fence is None:
            from kafka_spark_streaming_spark.config import fence_lease_ttl

            ttl = (
                fence_lease_ttl(self.spark)
                if self._lease_ttl_s is _LEASE_FROM_CONF
                else self._lease_ttl_s
            )
            self._fence = WriterFence.acquire(
                os.path.join(self.path, "_WRITER_EPOCH"),
                purpose="keyed-upsert-sink",
                lease_ttl_s=ttl,
            )
        return self._fence

    # -- state management -------------------------------------------------
    @staticmethod
    def _batch_of(version: str) -> int:
        """batch_id of a version dir name.  Names are
        ``v_{batch_id:012d}`` for a first attempt and
        ``v_{batch_id:012d}-r{k:06d}`` for the k-th RETRY attempt
        (r18: committed versions are IMMUTABLE — a foreachBatch retry
        used to rmtree+rewrite v_N in place, which deleted the files a
        live snapshot() pin was still reading; now every commit gets
        a fresh name and the superseded attempt lingers until prune,
        exactly like any other non-head version).  Attempt suffixes
        are zero-padded AND _versions() sorts numerically on
        (batch_id, attempt) rather than lexicographically (ADVICE r18:
        bare '-r10' sorted between '-r1' and '-r2', so after the 10th
        retry head selection picked a superseded attempt and _prune
        rmtree'd the newest committed state; numeric sort also keeps
        pre-fix stores with bare suffixes ordered correctly)."""
        return int(version[2:].split("-", 1)[0])

    @staticmethod
    def _attempt_of(version: str) -> int:
        """retry-attempt number of a version dir name (0 for a first
        attempt).  Parses both the zero-padded '-r000010' form and the
        bare '-r10' form written before the padding fix."""
        return int(version.rsplit("-r", 1)[1]) if "-r" in version else 0

    def _new_version_name(self, batch_id: int, versions: list[str]) -> str:
        base = f"v_{batch_id:012d}"
        attempts = [
            v for v in versions if v == base or v.startswith(base + "-r")
        ]
        if not attempts:
            return base
        k = 1 + max(self._attempt_of(v) for v in attempts)
        return f"{base}-r{k:06d}"

    def _versions(self) -> list[str]:
        # exclude in-flight '.tmp' build dirs: after a crash between the
        # tmp write and the rename they linger, and current() must never
        # surface uncommitted state (nor _prune count them toward keep).
        # Numeric (batch_id, attempt) key, NOT lexicographic — bare
        # pre-fix '-r10' suffixes break string ordering at k>=10.
        return sorted(
            (
                d for d in os.listdir(self.path)
                if d.startswith("v_") and "." not in d
                and os.path.isdir(os.path.join(self.path, d))
            ),
            key=lambda v: (self._batch_of(v), self._attempt_of(v)),
        )

    def _rb(self, col) -> Column:
        return F.pmod(F.xxhash64(col), F.lit(self.buckets)).cast("int")

    def _head_rb_dirs(self, version: str) -> list[str]:
        """rb= partition dirs physically present in a committed
        version ([] for a store written by the pre-r16 unpartitioned
        layout — the merge then falls back to a full-state LWW once
        and writes the new layout, a self-migrating upgrade)."""
        vdir = os.path.join(self.path, version)
        return sorted(
            d for d in os.listdir(vdir)
            if d.startswith("rb=")
            and os.path.isdir(os.path.join(vdir, d))
        )

    def _manifest_file(self, version: str) -> dict[str, str] | None:
        """The version's committed manifest, or None when NO manifest
        file exists (pre-r17 legacy layouts).  The None sentinel is
        the one distinction _manifest's {} cannot carry: a committed
        EMPTY manifest (real empty state — the purge-everything retry
        outcome) and a flat pre-r16 store both look like {} to
        callers that only see _manifest (ADVICE r17 upsert.py:281 —
        write_batch misclassified the former as flat_head and ran a
        needless all-bucket merge)."""
        import json

        mpath = os.path.join(self.path, version, MANIFEST_NAME)
        if os.path.exists(mpath):
            with open(mpath) as fh:
                return json.load(fh)
        return None

    def _manifest(self, version: str) -> dict[str, str]:
        """{rb= dir → owning version} for a committed version.  A
        version with no manifest file is a pre-r17 layout: the
        hard-link carry-forward wrote EVERY live partition into the
        head (links or data — indistinguishable and irrelevant here),
        so the head owning all its physical rb= dirs IS its manifest —
        the old layout is a degenerate manifest and migrates for free.
        A flat pre-r16 store has neither manifest nor rb= dirs → {}."""
        committed = self._manifest_file(version)
        if committed is not None:
            return committed
        return {d: version for d in self._head_rb_dirs(version)}

    def _write_manifest(self, vdir: str, manifest: dict[str, str]) -> None:
        """Written into the STILL-UNCOMMITTED tmp dir (the version
        commit is the dir rename), fsync'd so a post-rename crash
        cannot leave a truncated file (same durability policy as
        config.commit_layout).  A torn manifest would fail LOUD
        anyway — a truncated json.dump prefix is invalid JSON and
        json.load raises — never silently-wrong ownership."""
        import json

        with open(os.path.join(vdir, MANIFEST_NAME), "w") as fh:
            json.dump(manifest, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())

    def _current_raw(self) -> DataFrame:
        """Current state INCLUDING the rb layout column — see
        _read_state for the plan shape."""
        return self._read_state()[0]

    def _read_state(self) -> tuple[DataFrame, str | None, dict[str, str]]:
        """(state df incl. rb, head version, head manifest) from ONE
        version listing: one partition-pruned scan per version the
        head manifest references, unioned.  The per-owner basePath
        keeps rb a real partition column, so downstream rb.isin
        filters prune at the directory level (PartitionFilters) — and
        the fan-out is bounded by the compaction threshold, not by
        batch count.  Returning the head/manifest the plan was built
        from lets snapshot() derive its pin set from the SAME listing
        (ADVICE r18: a second _versions() read raced a concurrent
        write_batch — the pin set named the new head while the
        DataFrame still read the old manifest, so its files could be
        pruned despite the pin)."""
        versions = self._versions()
        if not versions:
            empty = self.spark.createDataFrame(
                [], STATE_SCHEMA
            ).withColumn("rb", F.lit(None).cast("int"))
            return empty, None, {}
        head = versions[-1]
        manifest = self._manifest(head)
        if not manifest:
            if self._manifest_file(head) is not None:
                # a committed EMPTY manifest is a real (empty) state —
                # the purge-everything outcome of an empty retry over a
                # first-ever batch — not the flat legacy layout
                empty = self.spark.createDataFrame(
                    [], STATE_SCHEMA
                ).withColumn("rb", F.lit(None).cast("int"))
                return empty, head, manifest
            # flat pre-r16 unpartitioned store
            df = self.spark.read.parquet(os.path.join(self.path, head))
            if "rb" not in df.columns:
                df = df.withColumn("rb", self._rb(F.col("rowkey")))
            return df, head, manifest
        by_owner: dict[str, list[str]] = {}
        for rb_dir, owner in manifest.items():
            by_owner.setdefault(owner, []).append(rb_dir)
        # explicit schema (STATE_SCHEMA + the rb partition column):
        # the cell layout is fixed, so none of the per-owner reads
        # needs a parquet footer-inference job — at one read per
        # referenced version per merge, that is compact_versions
        # 1-task driver jobs per batch saved (same job-floor lever as
        # the dedup store probes, r17)
        read_schema = T.StructType(
            STATE_SCHEMA.fields
            + [T.StructField("rb", T.IntegerType(), True)]
        )
        parts = []
        for owner, rb_dirs in sorted(by_owner.items()):
            vdir = os.path.join(self.path, owner)
            parts.append(
                self.spark.read.schema(read_schema)
                .option("basePath", vdir)
                .parquet(*[os.path.join(vdir, d) for d in sorted(rb_dirs)])
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.withColumn("rb", F.col("rb").cast("int")), head, manifest

    def current(self) -> DataFrame:
        """Current cell state as a DataFrame (empty if no writes yet).
        The rb layout column is internal — consumers see cell shape.
        LAZY: executing it after this writer advances past the keep
        window may hit pruned version dirs — see snapshot() for a
        pinned read."""
        return self._current_raw().drop("rb")

    def snapshot(self) -> DataFrame:
        """Version-PINNED read (VERDICT r17 #6): the returned
        DataFrame reads the manifest the head held at call time, and
        every version it references is excluded from prunes for as
        long as the DataFrame object is alive (weakref guard —
        dropping the reference releases the pin; no explicit close
        needed).  Closes current()'s documented lazy-across-prune
        caveat.  Scope (r19): pins are DURABLE pin files inside the
        store (module docstring at PIN_DIR), so every pruner on the
        host honors them — any attach in this process, a post-failover
        writer in a DIFFERENT process, or a standalone maintenance
        pass; liveness is pid-based (a holder that crashes without
        releasing is reaped at the next prune), mapping onto a lease
        TTL on multi-host deployments.  The pin is held by the
        RETURNED DataFrame object: keep it referenced while derived
        frames (selects/filters over it) are in use — deriving and
        dropping the original releases the pin at the next prune.

        The read plan and the pin set come from ONE _read_state()
        listing (ADVICE r18): a second listing could race a
        concurrent write_batch and pin the new head's versions while
        the DataFrame still read the old manifest.  And the pin
        follows the shared publish-then-verify protocol
        (fencing.pin_guarded, code-review r19): a pruner racing the
        listing-to-pin window fails the post-publish verify (or
        surfaces as a path-not-found while the plan is built over the
        just-pruned listing), and the attempt retries against the new
        head; see pin_guarded for the residual-window argument."""
        from pyspark.errors import AnalysisException

        from kafka_spark_streaming_spark.config import pin_ttl_for_writer
        from kafka_spark_streaming_spark.fencing import (
            PinRaceLost,
            is_path_not_found,
            pin_guarded,
            release_pin,
        )

        # the pin TTL must see this sink's EFFECTIVE fence lease, not
        # just the conf knob: a drain-default lease (constructor arg,
        # conf unset) would otherwise leave pins pid-based — wrong on
        # multi-host (code-review r20)
        ttl = pin_ttl_for_writer(
            self.spark,
            None
            if self._lease_ttl_s is _LEASE_FROM_CONF
            else self._lease_ttl_s,
        )

        def attempt():
            try:
                raw, head, manifest = self._read_state()
            except AnalysisException as exc:
                if not is_path_not_found(exc):
                    raise  # deterministic failure, not a race
                raise PinRaceLost(str(exc)) from exc
            df = raw.drop("rb")
            if head is None:
                return None, None, lambda _p: df
            pins = sorted({head} | set(manifest.values()))
            payload = {"versions": pins, "purpose": "snapshot"}
            if ttl is not None:
                # multi-host mode: the pin auto-expires instead of
                # relying on the single-host pid probe (fencing.live_pins)
                payload["lease_ttl_s"] = ttl
            # verify against a FILE-level sentinel where one exists
            # (ADVICE r19): _prune deletes via shutil.rmtree, which
            # removes files before the directory, so a pruner caught
            # MID-rmtree still passes an isdir probe with the data
            # already gone.  Each version's _MANIFEST.json (present on
            # every version this code writes) disappears in that same
            # file-removal phase, narrowing the undetected window to
            # rmtree's final rmdir; pre-r17 manifest-less versions
            # keep the isdir probe (captured at LISTING time — a
            # manifest observed then but missing at verify means a
            # deleter is mid-pass and must fail the verify).
            sentinels = [
                os.path.join(self.path, v, MANIFEST_NAME)
                if os.path.isfile(
                    os.path.join(self.path, v, MANIFEST_NAME)
                )
                else os.path.join(self.path, v)
                for v in pins
            ]

            def verify():
                return all(os.path.exists(s) for s in sentinels)

            def finish(pin_path):
                weakref.finalize(df, release_pin, pin_path)
                return df

            return payload, verify, finish

        return pin_guarded(
            os.path.join(self.path, PIN_DIR),
            attempt,
            what=f"snapshot({self.path!r})",
        )

    def _live_pins(self) -> set[str]:
        """Union of versions named by live-holder pin files — see
        fencing.live_pins for the liveness/reaping/corrupt policy."""
        from kafka_spark_streaming_spark.fencing import live_pins

        pinned: set[str] = set()
        for pin in live_pins(os.path.join(self.path, PIN_DIR)):
            pinned.update(pin.get("versions", []))
        return pinned

    def history(self) -> list[dict]:
        """Retained-version metadata, oldest first — the DESCRIBE
        HISTORY analogue for the versioned-parquet store.  Driver-side
        file metadata only (no Spark job): per retained version, its
        batch_id, how many live rb partitions its manifest references,
        how many of those it physically owns, and whether it is the
        head.  A version retained only because a newer manifest or a
        live snapshot pin references its files still appears — it is
        readable state."""
        versions = self._versions()
        out = []
        for v in versions:
            manifest = self._manifest(v)
            out.append(
                {
                    "version": v,
                    "batch_id": self._batch_of(v),
                    "live_partitions": len(manifest),
                    "owned_partitions": sum(
                        1 for owner in manifest.values() if owner == v
                    ),
                    "is_head": v == versions[-1],
                }
            )
        return out

    # -- the upsert -------------------------------------------------------
    def _merged_state(
        self, stamped: DataFrame, batch_id: int, rbs: list
    ) -> DataFrame:
        """LWW(touched prior partitions ∪ batch) — the distributed half
        of write_batch, factored out so the partition-pruned prior read
        is a testable plan property.  Rows outside `rbs` never enter
        the shuffle; they are carried forward file-for-file by
        write_batch."""
        prior = self._current_raw().filter(
            F.col("rb").isin(rbs) & (F.col("batch_id") < batch_id)
        )
        merged = prior.unionByName(stamped)
        w = W.partitionBy(*CELL_KEY).orderBy(
            F.desc("batch_id"), F.desc("value")
        )
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """MERGE-style last-write-wins upsert of (rowkey, cf, qualifier, value).

        One shuffle on the TOUCHED rb partitions' cells only (r16 —
        was the full state); untouched partitions carry into the new
        version as manifest entries pointing at their owning versions
        (r17 — was hard links, a local-FS-only mechanism).  Safe under
        foreachBatch replay even when the replay is NOT
        bit-deterministic (ADVICE r16): a retry of batch N is detected
        (committed head >= N) and merges ALL live partitions, so the
        batch_id < N filter purges the first attempt's rows everywhere
        — including rb buckets this attempt does not touch, where a
        wall-clock rowkey drift would otherwise leave them as
        carried-forward ghosts.

        Fenced (r18): the sink's writer token is acquired at the
        first call and re-checked immediately before every rename and
        before the prune — a zombie writer raises StaleWriterError
        instead of committing over a newer writer's head.
        """
        fence = self._writer_fence()
        fence.check()  # fail fast before any Spark work if already stale
        stamped = (
            batch_df.select(*CELL_KEY, F.col("value").cast("string"))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .withColumn("rb", self._rb(F.col("rowkey")))
            .persist()
        )
        try:
            # bounded collect (≤ buckets scalars) — names the touched
            # partitions AND materializes the batch cache in one job,
            # the same collect-as-materializer pattern as the
            # incremental-dedup batch body
            rbs = [r[0] for r in stamped.select("rb").distinct().collect()]
            versions = self._versions()
            head = versions[-1] if versions else None
            manifest = self._manifest(head) if head else {}
            # flat_head keys on manifest-FILE absence, not manifest
            # emptiness (ADVICE r17): a committed empty manifest is
            # real empty state, and classifying it as the flat legacy
            # layout ran a needless all-bucket migration merge.
            flat_head = (
                bool(head)
                and not manifest
                and self._manifest_file(head) is None
            )
            vname = self._new_version_name(batch_id, versions)
            out = os.path.join(self.path, vname)
            tmp = out + ".tmp"
            if not rbs:
                if not head or flat_head:
                    # empty batch over empty-or-flat state: a 0-row
                    # partitionBy write emits NO files, so the version
                    # would hold nothing readable.  Skip the version; a
                    # flat head stays readable as-is and migrates on
                    # the first non-empty batch (code-review r16).
                    return
                if self._batch_of(head) >= batch_id:
                    # EMPTY retry of a committed batch whose first
                    # attempt may have had rows (content drift — the
                    # same replay-determinism gap as the rowkey-drift
                    # case below, r17): carrying the manifest forward
                    # verbatim would keep the first attempt's rows
                    # forever.  Full purge-merge instead: every live
                    # partition re-merges under the batch_id < N
                    # filter against the empty batch.  If that purges
                    # the whole store the version commits an EMPTY
                    # manifest, which current() reads as empty state
                    # (distinct from the flat-legacy no-manifest-file
                    # case).
                    rbs = sorted(int(d[3:]) for d in manifest)
                else:
                    # empty batch over a manifest head: a pure-metadata
                    # version — every live partition carries forward in
                    # the manifest verbatim, no Spark job at all
                    if os.path.exists(tmp):
                        shutil.rmtree(tmp)
                    os.makedirs(tmp)
                    self._write_manifest(tmp, manifest)
                    fence.check()  # commit point: the version rename
                    if os.path.exists(out):
                        shutil.rmtree(out)
                    os.rename(tmp, out)
                    self._prune(keep=self.keep_versions)
                    fence.heartbeat()
                    return
            if flat_head:
                # pre-r16 unpartitioned head: one full merge migrates
                # the layout (no partition dirs to prune or carry)
                rbs = list(range(self.buckets))
            elif head and self._batch_of(head) >= batch_id:
                # RETRY of a committed batch (ADVICE r16): merge every
                # live partition so the batch_id < N purge reaches the
                # first attempt's rows wherever its (possibly
                # different) rowkeys landed.  Rare, so the one-off
                # full merge is cheap insurance.
                rbs = sorted({int(d[3:]) for d in manifest} | set(rbs))
            else:
                carried_owners = {
                    owner
                    for d, owner in manifest.items()
                    if int(d[3:]) not in set(rbs)
                }
                if len(carried_owners) + 1 > self.compact_versions:
                    # manifest would fan reads over too many versions:
                    # fold everything into this write (log-structured
                    # compaction, amortized one full rewrite per
                    # ~compact_versions batches)
                    rbs = sorted({int(d[3:]) for d in manifest} | set(rbs))
            new_state = self._merged_state(stamped, batch_id, rbs)

            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            new_state.write.mode("overwrite").partitionBy("rb").parquet(tmp)
            # manifest: carried partitions keep their owners; every rb
            # dir this write actually produced is owned by this
            # version.  A touched rb that merged to ZERO rows (all its
            # cells were first-attempt ghosts) writes no dir and drops
            # out of the manifest — exactly the purge semantics.
            touched = set(rbs)
            new_manifest = {
                d: owner
                for d, owner in manifest.items()
                if int(d[3:]) not in touched
            }
            for d in os.listdir(tmp):
                if d.startswith("rb=") and os.path.isdir(
                    os.path.join(tmp, d)
                ):
                    new_manifest[d] = vname
            self._write_manifest(tmp, new_manifest)
            fence.check()  # commit point: the version rename
            if os.path.exists(out):
                shutil.rmtree(out)
            os.rename(tmp, out)
            self._prune(keep=self.keep_versions)
            fence.heartbeat()  # renew the lease once per committed
            # batch (no-op write in pid mode — fencing.heartbeat)
        finally:
            stamped.unpersist()

    def _prune(self, keep: int) -> None:
        # deletions are a commit-point mutation too: a stale writer's
        # version listing may not include the new writer's head, so it
        # must not get to rmtree anything (fence is always held here —
        # _prune is only reached from a fenced write_batch)
        if self._fence is not None:
            self._fence.check()
        versions = self._versions()
        # live = the kept heads plus every version their manifests
        # reference — a version dir now holds data that NEWER versions
        # inherit by manifest entry, so "older than head-keep" is no
        # longer sufficient to delete (references are direct, never
        # chained: reading v_N touches only v_N's own manifest)
        live = set(versions[-keep:])
        for v in list(live):
            live.update(self._manifest(v).values())
        # snapshot pins: versions a handed-out snapshot() DataFrame
        # still references stay live until the DataFrame is collected —
        # durable pin files, so snapshots from OTHER attaches and
        # OTHER processes (the fenced predecessor's readers) are
        # honored too
        live.update(self._live_pins())
        for stale in versions:
            if stale in live:
                continue
            shutil.rmtree(os.path.join(self.path, stale), ignore_errors=True)
        # crash-leftover build dirs: a v_N.tmp at or below the committed
        # head can never be renamed into place (a replay of batch N
        # rewrites it from scratch first), so each one strands a full
        # state copy until the exact batch_id is retried (ADVICE r6
        # upsert.py:103). Future-id tmp dirs are left alone — their
        # batch is still in flight or will rewrite on retry.
        if versions:
            head = self._batch_of(versions[-1])
            for d in os.listdir(self.path):
                if not (d.startswith("v_") and d.endswith(".tmp")):
                    continue
                try:
                    n = int(d[2:-4].split("-", 1)[0])
                except ValueError:
                    continue
                if n <= head:
                    shutil.rmtree(
                        os.path.join(self.path, d), ignore_errors=True
                    )

    # -- convenience: the reference's two write shapes --------------------
    def _next_batch_id(self) -> int:
        versions = self._versions()
        return self._batch_of(versions[-1]) + 1 if versions else 0

    def put_single(self, rowkey: str, qualifier: str, value: str,
                   cf: str = "cf1", batch_id: int | None = None) -> None:
        """S3: one summary cell per batch (HbaseWriter.scala:22-31).

        batch_id defaults to (last committed version)+1: write_batch
        treats an equal-or-lower id as a replay of that batch, so a
        fixed default would make every later call drop all prior state.
        Pass an explicit id only for replay-idempotent streaming use.
        """
        self.write_batch(
            single_cell(self.spark, rowkey, qualifier, value, cf),
            self._next_batch_id() if batch_id is None else batch_id,
        )

    def put_bulk(self, messages_df: DataFrame, rowkey_prefix: str,
                 cf: str = "cf1", batch_id: int | None = None) -> None:
        """S4 intent: distinct (key,value) records → one cell each
        (HbaseWriter.scala:42-74), null keys → sentinel row."""
        self.write_batch(
            bulk_cells(messages_df, rowkey_prefix, cf),
            self._next_batch_id() if batch_id is None else batch_id,
        )


def single_cell(
    spark: SparkSession,
    rowkey: str,
    qualifier: str,
    value: str,
    cf: str = "cf1",
) -> DataFrame:
    """One summary cell in cell shape — the single source of the
    (rowkey, cf, qualifier, value) construction, shared by put_single
    and the pipeline's merged per-batch write (code-review r15: two
    inline copies could drift)."""
    return spark.createDataFrame(
        [(rowkey, cf, qualifier, value)],
        "rowkey string, cf string, qualifier string, value string",
    )


def bulk_cells(
    messages_df: DataFrame, rowkey_prefix: str, cf: str = "cf1"
) -> DataFrame:
    """The S4 bulk rows in cell shape (rowkey, cf, qualifier, value) —
    shared by put_bulk and the pipeline's merged per-batch write.
    Bulk rowkeys are '{prefix}-{key}' with qualifier 'content', so
    they can never collide with the batch summary cell (bare-epoch
    rowkey, qualifier 'message'/'messages')."""
    return (
        messages_df.select(
            F.when(
                F.col("key").isNull(),
                F.lit(f"{rowkey_prefix}-kafka empty message"),
            )
            .otherwise(F.concat(F.lit(f"{rowkey_prefix}-"), F.col("key")))
            .alias("rowkey"),
            F.lit(cf).alias("cf"),
            F.lit("content").alias("qualifier"),
            F.when(F.col("key").isNull(), F.lit("kafka empty message"))
            .otherwise(F.concat_ws("--|--", F.col("key"), F.col("value")))
            .alias("value"),
        )
        .dropDuplicates()
    )
