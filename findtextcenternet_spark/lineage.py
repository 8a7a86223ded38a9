"""Per-partition lineage + idempotent resume (SURVEY.md §7 Stage 5).

The reference's resumability is byte-range resume in its shard downloader
(downloader_src/main.cpp:50-71). At corpus scale the equivalent contract is:

* every completed run appends its docs to the output table plus one lineage
  row per output partition (partition id, doc count, bytes, run id, wall);
* every run also appends its settled urls to the compact ``_done_urls``
  side table (url + run_id only, url-hash-clustered files);
* a restarted job anti-joins the input against that side table and
  processes only the remainder — resume cost is O(done-set strings), not
  a scan over everything ever written.

Crash-window healing (the "never re-extracts" contract): the docs append
and the done-set append are two writes; only the docs append is the
commit point. On every resume the done-set is RECONCILED against the set
of committed docs run_ids (a partition listing, not a data scan): any
run committed to docs whose done append is not known COMPLETE — a crash
between or DURING the two appends, or a docs dir written before the side
table existed — has its urls backfilled from that run's pruned partition.
Completeness is a per-run ``done marker`` written only AFTER the done
append commits (``DocStore.mark_done``): a partially-visible done append
(multi-file job crashed mid-commit) has no marker, so its run is
backfilled in full rather than trusted on sight (ADVICE r4 — trusting
the mere presence of a run_id in the done DATA would skip the backfill
and re-extract that run's missing urls into duplicate doc rows). The
backfill may duplicate (url, run_id) rows inside ``_done_urls`` itself;
that is harmless — the resume anti-join is set-semantics — and doc rows,
the table that matters, are never duplicated. On Iceberg
``append_docs``+``append_done`` are one atomic commit and the marker
degenerates to snapshot membership.

Storage seam: all physical I/O goes through :class:`DocStore`.
:class:`ParquetDirStore` is the sandbox implementation (parquet
directories, partition dirs as commit markers);
:class:`InMemoryCatalogStore` proves the logic is directory-free; and
:class:`IcebergDocStore` is the production mapping made concrete —
snapshot reads, partition metadata (``committed_run_ids`` is a
metadata-table query, no listing), one snapshot commit per append (and,
where the catalog supports multi-table transactions, the healing pass
becomes a cheap no-op check). The resume/healing contract matrix
(tests/test_lineage_stores.py) is written once and parameterized over
the catalog-style stores.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_documents

# done-set file clustering: files are url-hash-clustered so a resume
# anti-join shuffles evenly; on Iceberg this is a bucket(url) partition
# spec and the read is a snapshot scan
DONE_BUCKETS = 64

LEGACY_RUN_ID = "legacy-backfill"


def _dir_nonempty(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if "_temporary" in root:
            continue
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


class DocStore:
    """Physical storage for one extraction output: docs + _done_urls +
    _quarantine + _lineage. Subclass per catalog; run_extract and the
    resume healing logic are storage-agnostic above this interface.

    Iceberg mapping (the production implementation): ``docs`` is a table
    partitioned by run_id with a bucket(url) spec; ``committed_run_ids``
    reads the partitions metadata table (no file listing);
    ``read_run_urls`` is a snapshot read with a run_id partition filter;
    ``append_docs``+``append_done`` become one atomic multi-table commit,
    so the healing pass finds nothing to heal.
    """

    def docs_nonempty(self) -> bool:
        raise NotImplementedError

    def done_nonempty(self) -> bool:
        raise NotImplementedError

    def committed_run_ids(self) -> set[str]:
        """run_ids whose docs append committed (partition metadata)."""
        raise NotImplementedError

    def has_legacy_flat_docs(self) -> bool:
        """True when docs were written before run_id partitioning."""
        raise NotImplementedError

    def read_done(self) -> DataFrame:
        raise NotImplementedError

    def read_run_urls(self, run_id: str) -> DataFrame:
        """url column of one committed run — partition-pruned."""
        raise NotImplementedError

    def read_legacy_urls(self) -> DataFrame:
        """url column of the pre-partitioning flat docs files."""
        raise NotImplementedError

    def append_docs(self, df: DataFrame) -> None:
        raise NotImplementedError

    def read_docs(self) -> DataFrame:
        """Every committed doc row across all runs (snapshot read) — the
        input of corpus-wide post-passes (dedup, WET publication)."""
        raise NotImplementedError

    def append_done(self, urls: DataFrame) -> None:
        """urls: (url, run_id) frame, appended bucket-clustered."""
        raise NotImplementedError

    def mark_done(self, run_ids: list[str]) -> None:
        """Record that the done append for these runs COMMITTED in full —
        called only after ``append_done`` returns. On Iceberg this is a
        no-op (append_docs+append_done are one atomic commit)."""
        raise NotImplementedError

    def done_run_ids(self) -> set[str]:
        """run_ids whose done append is known complete (see mark_done).
        A run_id merely present in the done DATA is not enough: a
        multi-file append observed mid-crash can be partial, and trusting
        it would skip the healing backfill (ADVICE r4)."""
        raise NotImplementedError

    def append_quarantine(self, df: DataFrame) -> None:
        raise NotImplementedError

    def quarantine_nonempty(self) -> bool:
        raise NotImplementedError

    def read_quarantine(self) -> DataFrame:
        raise NotImplementedError

    def read_run_quarantine(self, run_id: str) -> DataFrame:
        """(url, error, run_id) error rows of one committed run, read
        from the docs table (error rows ARE the quarantine; the mirror
        table is derived) — partition-pruned; healing uses this to
        rebuild the quarantine mirror for a run whose post-docs appends
        were lost to a crash."""
        raise NotImplementedError

    def append_lineage(self, df: DataFrame) -> None:
        raise NotImplementedError

    def read_lineage(self) -> DataFrame:
        raise NotImplementedError

    # ----- compaction (small-files maintenance; see compact_docs) -----

    def drop_runs(self, run_ids: list[str]) -> None:
        """Remove committed runs from the docs table (metadata delete on
        a catalog, partition-dir removal on a filesystem). Dropping a
        run_id that no longer exists is a no-op — the healing pass
        replays drops idempotently."""
        raise NotImplementedError

    def record_compaction(self, compact_id: str,
                          replaced: list[str]) -> None:
        """Atomically record that ``compact_id`` supersedes ``replaced``
        — the compaction's commit point: present → roll forward (drop
        leftovers of ``replaced``); absent → roll back (drop the
        unmarked compact run)."""
        raise NotImplementedError

    def compaction_log(self) -> dict[str, list[str]]:
        """compact_id → replaced run_ids, every compaction ever
        recorded."""
        raise NotImplementedError


class ParquetDirStore(DocStore):
    """Parquet-directory stand-in (the sandbox has no catalog): partition
    directories under docs/ are the commit markers (Spark's output
    committer renames them in atomically from _temporary)."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        self.done_dir = os.path.join(out_dir, "_done_urls")
        self.quarantine_dir = os.path.join(out_dir, "_quarantine")
        self.lineage_dir = os.path.join(out_dir, "_lineage")

    def docs_nonempty(self) -> bool:
        return _dir_nonempty(self.docs_dir)

    def done_nonempty(self) -> bool:
        return _dir_nonempty(self.done_dir)

    def committed_run_ids(self) -> set[str]:
        if not os.path.isdir(self.docs_dir):
            return set()
        out = set()
        for e in os.listdir(self.docs_dir):
            if e.startswith("run_id=") and _dir_nonempty(
                    os.path.join(self.docs_dir, e)):
                out.add(e.split("=", 1)[1])
        return out

    def has_legacy_flat_docs(self) -> bool:
        if not os.path.isdir(self.docs_dir):
            return False
        return any(e.endswith(".parquet")
                   for e in os.listdir(self.docs_dir))

    def read_done(self) -> DataFrame:
        return self.spark.read.parquet(self.done_dir)

    def read_run_urls(self, run_id: str) -> DataFrame:
        # read the partition directory itself: pruned by construction,
        # and immune to the mixed flat/partitioned layout that breaks
        # partition inference over the whole dir
        part = os.path.join(self.docs_dir, f"run_id={run_id}")
        return self.spark.read.parquet(part).select("url")

    def read_legacy_urls(self) -> DataFrame:
        flat = [os.path.join(self.docs_dir, e)
                for e in os.listdir(self.docs_dir)
                if e.endswith(".parquet")]
        return self.spark.read.parquet(*flat).select("url")

    def append_docs(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy("run_id").parquet(self.docs_dir)

    def read_docs(self) -> DataFrame:
        if not self.has_legacy_flat_docs():
            return self.spark.read.parquet(self.docs_dir)
        # mixed layout: flat pre-partitioning files at the root next to
        # run_id= dirs break whole-dir partition discovery ('conflicting
        # directory structures') — read each shape explicitly, like
        # read_run_urls does
        flat = [os.path.join(self.docs_dir, e)
                for e in os.listdir(self.docs_dir)
                if e.endswith(".parquet")]
        out = (self.spark.read.parquet(*flat)
               .withColumn("run_id", F.lit(LEGACY_RUN_ID)))
        for rid in sorted(self.committed_run_ids()):
            part = os.path.join(self.docs_dir, f"run_id={rid}")
            out = out.unionByName(
                self.spark.read.parquet(part)
                .withColumn("run_id", F.lit(rid)),
                allowMissingColumns=True)
        return out

    def append_done(self, urls: DataFrame) -> None:
        (urls.repartition(DONE_BUCKETS, "url")
         .write.mode("append").parquet(self.done_dir))

    def mark_done(self, run_ids: list[str]) -> None:
        # leading underscore: Spark's parquet reader treats the marker
        # as a hidden/metadata file and never tries to parse it
        os.makedirs(self.done_dir, exist_ok=True)
        for rid in run_ids:
            with open(os.path.join(self.done_dir, f"_run_{rid}.done"),
                      "w"):
                pass

    def done_run_ids(self) -> set[str]:
        if not os.path.isdir(self.done_dir):
            return set()
        return {e[len("_run_"):-len(".done")]
                for e in os.listdir(self.done_dir)
                if e.startswith("_run_") and e.endswith(".done")}

    def append_quarantine(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.quarantine_dir)

    def quarantine_nonempty(self) -> bool:
        return _dir_nonempty(self.quarantine_dir)

    def read_quarantine(self) -> DataFrame:
        return self.spark.read.parquet(self.quarantine_dir)

    def read_run_quarantine(self, run_id: str) -> DataFrame:
        part = os.path.join(self.docs_dir, f"run_id={run_id}")
        return (self.spark.read.parquet(part)
                .filter(F.col("error").isNotNull())
                .select("url", "error")
                .withColumn("run_id", F.lit(run_id)))

    def append_lineage(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.lineage_dir)

    def read_lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_dir)

    def drop_runs(self, run_ids: list[str]) -> None:
        import shutil

        for rid in run_ids:
            part = os.path.join(self.docs_dir, f"run_id={rid}")
            if os.path.isdir(part):
                shutil.rmtree(part)

    def record_compaction(self, compact_id: str,
                          replaced: list[str]) -> None:
        import json

        d = os.path.join(self.out_dir, "_compactions")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{compact_id}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"compact_id": compact_id,
                       "replaced": sorted(replaced)}, f)
        # atomic publish: the marker either exists complete or not at all
        os.replace(tmp, os.path.join(d, f"{compact_id}.json"))

    def compaction_log(self) -> dict[str, list[str]]:
        import json

        d = os.path.join(self.out_dir, "_compactions")
        if not os.path.isdir(d):
            return {}
        out = {}
        for e in sorted(os.listdir(d)):
            if e.endswith(".json") and not e.startswith("."):
                with open(os.path.join(d, e)) as f:
                    rec = json.load(f)
                out[rec["compact_id"]] = rec["replaced"]
        return out


class InMemoryCatalogStore(DocStore):
    """Catalog-style second implementation of the storage seam (VERDICT
    r4 item 7): run membership lives in METADATA — a committed-runs dict
    keyed by run_id — exactly like an Iceberg partitions metadata table,
    so ``committed_run_ids`` does no listing and ``read_run_urls`` is a
    metadata-keyed lookup, not a path scan. Rows are held as collected
    Spark Rows + schema (this store is a test/CI double; the point is
    that ``run_extract`` and the healing pass run UNCHANGED through a
    storage shape with none of ParquetDirStore's directory semantics —
    no partition dirs, no marker files, no legacy flat layout)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._docs: dict[str, tuple] = {}        # run_id -> (schema, rows)
        self._done: list[tuple] = []              # [(schema, rows), ...]
        self._done_marked: set[str] = set()
        self._quarantine: list[tuple] = []
        self._lineage: list[tuple] = []
        self._compactions: dict[str, list[str]] = {}

    @staticmethod
    def _collect(df: DataFrame) -> tuple:
        return df.schema, df.collect()

    def _frame(self, parts: list[tuple]) -> DataFrame:
        schema = parts[0][0]
        rows = [r for _s, rs in parts for r in rs]
        return self.spark.createDataFrame(rows, schema=schema)

    def docs_nonempty(self) -> bool:
        return any(rows for _s, rows in self._docs.values())

    def done_nonempty(self) -> bool:
        return any(rows for _s, rows in self._done)

    def committed_run_ids(self) -> set[str]:
        return {rid for rid, (_s, rows) in self._docs.items() if rows}

    def has_legacy_flat_docs(self) -> bool:
        return False        # a catalog has no pre-catalog layout

    def read_done(self) -> DataFrame:
        return self._frame(self._done)

    def read_run_urls(self, run_id: str) -> DataFrame:
        schema, rows = self._docs[run_id]
        return self.spark.createDataFrame(rows, schema=schema).select("url")

    def read_legacy_urls(self) -> DataFrame:
        raise AssertionError("catalog store has no legacy layout")

    def append_docs(self, df: DataFrame) -> None:
        schema, rows = self._collect(df)
        by_run: dict[str, list] = {}
        for r in rows:
            by_run.setdefault(r["run_id"], []).append(r)
        for rid, rs in by_run.items():
            old = self._docs.get(rid)
            self._docs[rid] = (schema, (old[1] if old else []) + rs)

    def read_docs(self) -> DataFrame:
        return self._frame(list(self._docs.values()))

    def append_done(self, urls: DataFrame) -> None:
        self._done.append(self._collect(urls))

    def mark_done(self, run_ids: list[str]) -> None:
        self._done_marked.update(run_ids)

    def done_run_ids(self) -> set[str]:
        return set(self._done_marked)

    def append_quarantine(self, df: DataFrame) -> None:
        self._quarantine.append(self._collect(df))

    def quarantine_nonempty(self) -> bool:
        return any(rows for _s, rows in self._quarantine)

    def read_run_quarantine(self, run_id: str) -> DataFrame:
        schema, rows = self._docs[run_id]
        return (self.spark.createDataFrame(rows, schema=schema)
                .filter(F.col("error").isNotNull())
                .select("url", "error", "run_id"))

    def append_lineage(self, df: DataFrame) -> None:
        self._lineage.append(self._collect(df))

    def read_lineage(self) -> DataFrame:
        return self._frame(self._lineage)

    def read_quarantine(self) -> DataFrame:
        return self._frame(self._quarantine)

    def drop_runs(self, run_ids: list[str]) -> None:
        for rid in run_ids:
            self._docs.pop(rid, None)

    def record_compaction(self, compact_id: str,
                          replaced: list[str]) -> None:
        self._compactions[compact_id] = sorted(replaced)

    def compaction_log(self) -> dict[str, list[str]]:
        return dict(self._compactions)


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when an Iceberg catalog named ``catalog`` is configured AND
    the Iceberg Spark runtime is on the classpath (a namespace probe —
    cheap, no data). This sandbox ships neither, so the contract matrix
    runs :class:`IcebergDocStore` behind a skip guard; on a cluster with
    ``spark.sql.catalog.<name>`` configured the same matrix goes green
    with zero code changes."""
    try:
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.fcn_probe")
        spark.sql(f"DROP NAMESPACE IF EXISTS {catalog}.fcn_probe")
        return True
    except Exception:
        return False


class IcebergDocStore(DocStore):
    """The production storage mapping documented on :class:`DocStore`,
    made concrete against Spark's DataSourceV2 + an Iceberg catalog.

    * ``docs`` → ``{ns}.docs`` partitioned by ``run_id``
      (``writeTo(...).partitionedBy(col("run_id")).create()`` then
      ``.append()`` — each append is one atomic snapshot commit);
    * ``committed_run_ids`` → ``SELECT partition.run_id FROM
      {ns}.docs.partitions`` — the partitions METADATA table: no file
      listing, O(partitions) rows;
    * ``read_run_urls`` → snapshot read with a ``run_id`` filter
      (partition-pruned by the spec);
    * ``_done_urls`` → ``{ns}.done`` (url + run_id; on a real deployment
      bucket(url, 64) in the partition spec mirrors DONE_BUCKETS);
    * ``mark_done`` → append to ``{ns}.done_marks``. Where the catalog
      supports multi-table transactions (or a WAP branch), docs + done +
      mark collapse into ONE commit and the healing pass degenerates to
      a no-op check — the marks table keeps the crash-window contract
      testable on catalogs without that.

    Requires ``iceberg_available``; everything else (run_extract, resume,
    healing) is the UNCHANGED storage-agnostic logic above DocStore.
    """

    def __init__(self, spark: SparkSession, namespace: str) -> None:
        self.spark = spark
        self.ns = namespace            # e.g. "local.extract_2026_03"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")
        self.docs_tbl = f"{namespace}.docs"
        self.done_tbl = f"{namespace}.done"
        self.marks_tbl = f"{namespace}.done_marks"
        self.quarantine_tbl = f"{namespace}.quarantine"
        self.lineage_tbl = f"{namespace}.lineage"

    def _exists(self, tbl: str) -> bool:
        return self.spark.catalog.tableExists(tbl)

    def _append(self, df: DataFrame, tbl: str, partition: str | None = None
                ) -> None:
        if self._exists(tbl):
            df.writeTo(tbl).append()
            return
        w = df.writeTo(tbl).using("iceberg")
        if partition:
            w = w.partitionedBy(F.col(partition))
        w.create()

    def docs_nonempty(self) -> bool:
        return bool(self.committed_run_ids())

    def done_nonempty(self) -> bool:
        return (self._exists(self.done_tbl)
                and bool(self.spark.table(self.done_tbl).head(1)))

    def committed_run_ids(self) -> set[str]:
        if not self._exists(self.docs_tbl):
            return set()
        rows = self.spark.sql(
            f"SELECT DISTINCT partition.run_id AS run_id "
            f"FROM {self.docs_tbl}.partitions").collect()
        return {r["run_id"] for r in rows}

    def has_legacy_flat_docs(self) -> bool:
        return False        # a catalog has no pre-catalog layout

    def read_done(self) -> DataFrame:
        return self.spark.table(self.done_tbl)

    def read_run_urls(self, run_id: str) -> DataFrame:
        return (self.spark.table(self.docs_tbl)
                .filter(F.col("run_id") == run_id).select("url"))

    def read_legacy_urls(self) -> DataFrame:
        raise AssertionError("catalog store has no legacy layout")

    def append_docs(self, df: DataFrame) -> None:
        self._append(df, self.docs_tbl, partition="run_id")

    def read_docs(self) -> DataFrame:
        return self.spark.table(self.docs_tbl)

    def append_done(self, urls: DataFrame) -> None:
        self._append(urls.repartition(DONE_BUCKETS, "url"), self.done_tbl)

    def mark_done(self, run_ids: list[str]) -> None:
        if not run_ids:
            return
        df = self.spark.createDataFrame([(r,) for r in run_ids],
                                        "run_id string")
        self._append(df, self.marks_tbl)

    def done_run_ids(self) -> set[str]:
        if not self._exists(self.marks_tbl):
            return set()
        return {r["run_id"]
                for r in self.spark.table(self.marks_tbl).collect()}

    def append_quarantine(self, df: DataFrame) -> None:
        self._append(df, self.quarantine_tbl)

    def quarantine_nonempty(self) -> bool:
        return (self._exists(self.quarantine_tbl)
                and bool(self.spark.table(self.quarantine_tbl).head(1)))

    def read_run_quarantine(self, run_id: str) -> DataFrame:
        return (self.spark.table(self.docs_tbl)
                .filter((F.col("run_id") == run_id)
                        & F.col("error").isNotNull())
                .select("url", "error", "run_id"))

    def append_lineage(self, df: DataFrame) -> None:
        self._append(df, self.lineage_tbl)

    def read_lineage(self) -> DataFrame:
        return self.spark.table(self.lineage_tbl)

    def read_quarantine(self) -> DataFrame:
        return self.spark.table(self.quarantine_tbl)

    def drop_runs(self, run_ids: list[str]) -> None:
        # partition-level metadata delete (one snapshot commit); the
        # native alternative is CALL rewrite_data_files, but routing
        # through the seam keeps compact_docs storage-agnostic
        ids = ", ".join(f"'{r}'" for r in run_ids)
        self.spark.sql(
            f"DELETE FROM {self.docs_tbl} WHERE run_id IN ({ids})")

    def record_compaction(self, compact_id: str,
                          replaced: list[str]) -> None:
        self._append(self.spark.createDataFrame(
            [(compact_id, list(sorted(replaced)))],
            "compact_id string, replaced array<string>"),
            f"{self.ns}.compactions")

    def compaction_log(self) -> dict[str, list[str]]:
        tbl = f"{self.ns}.compactions"
        if not self._exists(tbl):
            return {}
        return {r["compact_id"]: list(r["replaced"])
                for r in self.spark.table(tbl).collect()}


def _settled_urls(store: DocStore, heal: bool) -> DataFrame | None:
    """Urls already settled in the output — extracted OR quarantined (a
    poison page is quarantined exactly once per output directory, never
    re-validated on every resume).

    Reconciles the compact ``_done_urls`` side table against the
    committed docs run_ids: any run committed to docs but absent from
    the side table (crash between the two appends, or a pre-side-table
    output dir) contributes its urls from a partition-pruned read — and,
    with ``heal=True``, is backfilled into ``_done_urls`` so the NEXT
    resume is O(done-set) again. Returns None when nothing is settled.
    """
    if heal:
        # a compaction that crashed mid-window can leave the docs table
        # with BOTH the compacted run and (some of) the runs it replaced
        # — duplicate rows for every post-pass. Settle it first: marker
        # present → roll forward; unmarked compact run → roll back.
        heal_compaction(store)

    docs_any = store.docs_nonempty()
    done_any = store.done_nonempty()
    if not docs_any and not done_any:
        return None

    done = store.read_done().select("url", "run_id") if done_any else None
    # trust only runs whose done append is KNOWN complete (marker written
    # after the append commits) — a run_id visible in the done data could
    # be a partially-committed append, and skipping its backfill would
    # re-extract the missing urls into duplicate doc rows (ADVICE r4)
    done_ids = store.done_run_ids() if done_any else set()

    missing = store.committed_run_ids() - done_ids
    backfills = [store.read_run_urls(rid).withColumn("run_id", F.lit(rid))
                 for rid in sorted(missing)]
    if store.has_legacy_flat_docs() and LEGACY_RUN_ID not in done_ids:
        backfills.append(store.read_legacy_urls()
                         .withColumn("run_id", F.lit(LEGACY_RUN_ID)))

    if not backfills:
        return done.select("url") if done is not None else None

    missing_urls = backfills[0]
    for b in backfills[1:]:
        missing_urls = missing_urls.unionByName(b)
    if heal:
        # distinct() collapses exact (url, run_id) duplicate rows within
        # this backfill; a url re-extracted under TWO run_ids still lands
        # twice — tolerated, the resume anti-join is set-semantics
        store.append_done(missing_urls.distinct())
        # the quarantine MIRROR is also post-docs state: rebuild it for
        # the backfilled runs from their committed error rows, skipping
        # urls already mirrored (quarantined exactly once per output dir)
        q_backfill = None
        for rid in sorted(missing):
            q = store.read_run_quarantine(rid)
            q_backfill = q if q_backfill is None else q_backfill.unionByName(q)
        if q_backfill is not None:
            if store.quarantine_nonempty():
                q_backfill = q_backfill.join(
                    store.read_quarantine().select("url"),
                    "url", "left_anti")
            q_backfill = q_backfill.localCheckpoint()
            if q_backfill.head(1):
                store.append_quarantine(q_backfill)
        healed_ids = sorted(missing)
        if store.has_legacy_flat_docs() and LEGACY_RUN_ID not in done_ids:
            healed_ids.append(LEGACY_RUN_ID)
        store.mark_done(healed_ids)
        healed = store.read_done().select("url")
        return healed
    union = missing_urls.select("url")
    if done is not None:
        union = union.unionByName(done.select("url"))
    return union


def extracted_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Read-only view of the settled urls (see ``_settled_urls``): the
    ``_done_urls`` side table unioned with any committed-but-unrecorded
    runs. Does not write; ``run_extract`` heals on resume."""
    return _settled_urls(ParquetDirStore(spark, out_dir), heal=False)


def run_extract(pages: DataFrame, out_dir: str,
                run_id: str | None = None,
                num_partitions: int | None = None,
                store: DocStore | None = None) -> dict:
    """One resumable extraction run — single pass, no full-output rescans.

    Anti-joins pages already settled (resume, with done-set healing —
    see module docstring), runs the extraction pipeline (poison pills
    become in-pass error rows, never task failures), pins the combined
    frame once (localCheckpoint — the docs write, done-set, quarantine
    and lineage all derive from the SAME materialization; nothing
    re-reads the docs table, the 100 TB listing killer), and appends:
    docs (the commit point), then _done_urls, then _quarantine/_lineage.
    A crash after the docs append is healed by the next resume's
    reconciliation — no re-extraction, no duplicates.
    """
    spark = pages.sparkSession
    store = store or ParquetDirStore(spark, out_dir)
    run_id = run_id or uuid.uuid4().hex[:12]
    if run_id.startswith(COMPACT_PREFIX):
        # the prefix is reserved for compaction rewrites: an extraction
        # run named compact-* would be rolled back as an orphan by the
        # next heal_compaction (deleting real docs)
        raise ValueError(
            f"run_id must not start with {COMPACT_PREFIX!r} "
            "(reserved for compact_docs rewrites)")

    done = _settled_urls(store, heal=True)
    todo = pages if done is None else pages.join(done, "url", "left_anti")

    t0 = time.time()
    combined = extract_documents(todo, num_partitions)
    out = (combined
           .withColumn("part_id", F.spark_partition_id())
           .withColumn("run_id", F.lit(run_id)))
    # pin ONE materialization: part_id comes from spark_partition_id, so
    # every consumer below must see the same physical run, and the docs
    # write must not recompute the extraction a second time. On Iceberg
    # the equivalent is write-then-snapshot-read; here localCheckpoint
    # keeps the run's output on executor-local disk for its 3 consumers.
    out = out.localCheckpoint(eager=True)
    try:
        store.append_docs(out)
        wall = time.time() - t0

        # this run's settled urls (docs AND quarantine rows) → compact
        # done-set side table: resume reads O(done-set), one string
        # column, instead of the url column of everything ever written
        store.append_done(out.select("url", "run_id"))

        quarantine = out.filter(F.col("error").isNotNull())
        n_quarantined = quarantine.count()
        if n_quarantined:
            store.append_quarantine(
                quarantine.select("url", "error", "run_id"))

        good = out.filter(F.col("error").isNull())
        lineage = (good.groupBy("part_id")
                   .agg(F.count("*").alias("n_docs"),
                        # BYTES, not characters: CJK text is ~3 B/char
                        F.sum(F.octet_length("text")).alias("text_bytes"),
                        F.sum(F.when(F.col("path") == "raster", 1)
                              .otherwise(0)).alias("n_raster"))
                   .withColumn("run_id", F.lit(run_id))
                   .withColumn("wall_sec", F.lit(round(wall, 3)))
                   .withColumn("committed_at", F.current_timestamp()))
        store.append_lineage(lineage)
        # the marker means the run is FULLY recorded — done set,
        # quarantine mirror AND lineage — so it is written LAST: a crash
        # anywhere above leaves the run unmarked and the next resume's
        # healing pass re-derives all three from the committed docs
        # (re-extraction never happens either way; docs are the commit
        # point and the anti-join sees the backfilled done rows)
        store.mark_done([run_id])
        n_docs = good.count()
    finally:
        out.unpersist()
    return {"run_id": run_id, "n_docs": n_docs,
            "n_quarantined": n_quarantined, "wall_sec": round(wall, 3),
            "docs_dir": os.path.join(out_dir, "docs"),
            "lineage_dir": os.path.join(out_dir, "_lineage"),
            "quarantine_dir": os.path.join(out_dir, "_quarantine")}


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return ParquetDirStore(spark, out_dir).read_lineage()


# ---------------------------------------------- small-files compaction

COMPACT_PREFIX = "compact-"


def heal_compaction(store: DocStore) -> dict:
    """Settle any compaction interrupted mid-window (idempotent; a
    no-op costs one metadata scan). Two crash shapes:

    * marker present, replaced runs still committed → the compaction
      COMMITTED (the marker is the commit point) but the drop was cut
      short: roll FORWARD by re-dropping the leftovers;
    * compact-prefixed run committed with NO marker → the compaction
      never committed: roll BACK by dropping the orphan compact run
      (every row it holds is still in the original runs).

    ``run_extract``'s healing calls this before the resume anti-join, so
    a crashed compaction can never feed duplicate rows to a post-pass.
    """
    committed = store.committed_run_ids()
    log = store.compaction_log()
    healed = {"rolled_forward": 0, "rolled_back": 0}
    for cid, replaced in log.items():
        leftovers = set(replaced) & committed
        if cid in committed and leftovers:
            store.drop_runs(sorted(leftovers))
            healed["rolled_forward"] += 1
    orphans = sorted(
        rid for rid in store.committed_run_ids()
        if rid.startswith(COMPACT_PREFIX) and rid not in log)
    if orphans:
        store.drop_runs(orphans)
        healed["rolled_back"] = len(orphans)
    return healed


def compact_docs(store: DocStore, num_files: int = 8,
                 compact_id: str | None = None) -> dict:
    """Rewrite every committed run into ONE compact run of ``num_files``
    files — the small-files maintenance pass an incremental crawl needs:
    ten thousand resumed runs × 32 part files each turns every
    corpus-wide post-pass into a listing/open storm; compaction restores
    O(num_files) scans without touching a single row's content.

    Crash-safe by marker (see :func:`heal_compaction`): write the
    compact run (atomic per-partition commit) → mark it done (its urls
    are already settled under the original runs, so the resume healing
    must not backfill them a second time) → record the compaction
    marker (the commit point) → drop the replaced runs. History is
    preserved where it lives: ``_done_urls`` and ``_lineage`` keep the
    ORIGINAL run_ids; only the physical docs layout changes.

    On Iceberg the engine-native equivalent is
    ``CALL rewrite_data_files`` — this seam-level version exists so the
    parquet-dir and catalog stores share one tested protocol.

    Returns a summary dict; a store with ≤1 committed run is already
    compact (no-op)."""
    if compact_id is not None and not compact_id.startswith(COMPACT_PREFIX):
        # the prefix is how heal_compaction recognizes an unmarked
        # compact run to roll back — without it a crashed compaction
        # would survive as duplicate rows
        raise ValueError(
            f"compact_id must start with {COMPACT_PREFIX!r}")
    heal_compaction(store)
    if store.has_legacy_flat_docs():
        raise ValueError(
            "compaction requires the run_id-partitioned layout; "
            "re-extract the legacy flat docs into a partitioned store "
            "first")
    old = sorted(store.committed_run_ids())
    if len(old) <= 1:
        return {"compacted_runs": 0, "compact_id": None, "n_docs": 0}
    cid = compact_id or (COMPACT_PREFIX + uuid.uuid4().hex[:12])
    rewritten = (store.read_docs()
                 .repartition(num_files)
                 .withColumn("run_id", F.lit(cid)))
    store.append_docs(rewritten)
    store.mark_done([cid])
    store.record_compaction(cid, old)      # <- the commit point
    store.drop_runs(old)
    n_docs = store.read_docs().count()
    return {"compacted_runs": len(old), "compact_id": cid,
            "n_docs": n_docs}
