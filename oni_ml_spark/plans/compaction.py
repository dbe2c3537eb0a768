"""Small-file compaction for parquet datasets — the table-maintenance half
of the 100 TB story.  Streaming sinks, incremental upserts, and day-grain
refreshes all leave a long tail of under-sized files; each one costs a
task, a footer read, and scheduler overhead per scan, and at ~10⁵ extra
files the driver's listing alone dominates small queries.  This module
plans and executes bin-packed rewrites of ONLY the undersized files,
partition directory by partition directory, leaving right-sized files
untouched (metadata-only moves, never rewritten).

Design:
- ``dataset_files`` — one recursive FS listing → (file, bytes, dir).
  Planning is driver-side over this manifest: at 1 GiB target files a
  100 TB table is a ~10⁵-row listing, megabytes of driver memory.
- ``compaction_plan`` — per directory, greedy first-fit-decreasing
  bin-packing of files smaller than ``small_bytes`` (default target/2)
  into ``target_bytes`` bins.  Directories with fewer than two small
  files are left alone (nothing to merge).
- ``compact_dataset`` — executes the plan with a journaled three-phase
  swap: (1) write each bin's rows into a hidden staging dir (underscore
  prefix → invisible to parquet readers), (2) journal, (3) move originals
  to a hidden trash dir, move staged bins live, clean up.  Every phase-3
  step is a per-file metadata move.  A crash leaves the journal behind;
  ``recover_compaction`` rolls FORWARD when the originals are already in
  trash and BACK otherwise, so the dataset converges to exactly-one of
  {pre-compaction, post-compaction} content.

Isolation caveat (stated, not hidden): plain parquet directories have no
snapshot isolation — a reader listing files DURING phase 3 can see a few
rows missing (original moved, bin not yet live).  Run compaction in the
maintenance window, or use a table format (Delta/Iceberg OPTIMIZE) when
concurrent readers need isolation; the planning/bin-packing here is the
same algorithm those formats run.
"""

from __future__ import annotations

import json
import posixpath
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _is_hidden(name: str) -> bool:
    return name.startswith("_") or name.startswith(".")


def dataset_files(spark: SparkSession, path: str) -> list[dict]:
    """Recursive listing of the dataset's DATA files: [{file, bytes, dir}],
    dir relative to the root ('' for unpartitioned roots).  Skips hidden
    files/dirs (_SUCCESS, staging, trash).  One FS metadata pass — no data
    read."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    root = fs.getFileStatus(jpath).getPath().toString()
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(root):].lstrip("/")
        parts = rel.split("/")
        if any(_is_hidden(p) for p in parts):
            continue
        out.append(
            {
                "file": full,
                "bytes": int(st.getLen()),
                "dir": posixpath.dirname(rel),
            }
        )
    return out


@dataclass
class CompactionPlan:
    target_bytes: int
    small_bytes: int
    # [{dir, files: [full paths], bytes}] — one entry per output bin
    bins: list[dict] = field(default_factory=list)
    n_files_total: int = 0
    n_files_small: int = 0

    @property
    def n_files_compacted(self) -> int:
        return sum(len(b["files"]) for b in self.bins)

    def summary(self) -> dict:
        return {
            "n_files_total": self.n_files_total,
            "n_files_small": self.n_files_small,
            "n_files_compacted": self.n_files_compacted,
            "n_bins": len(self.bins),
            "files_removed": self.n_files_compacted - len(self.bins),
        }


def compaction_plan(
    files: list[dict],
    target_bytes: int,
    small_bytes: int | None = None,
) -> CompactionPlan:
    """Greedy first-fit-decreasing bin-packing of each directory's small
    files.  A bin may exceed target_bytes only when a single file does;
    singleton bins are dropped (rewriting one file buys nothing)."""
    if small_bytes is None:
        small_bytes = target_bytes // 2
    plan = CompactionPlan(target_bytes=target_bytes, small_bytes=small_bytes)
    plan.n_files_total = len(files)
    by_dir: dict[str, list[dict]] = {}
    for f in files:
        if f["bytes"] < small_bytes:
            by_dir.setdefault(f["dir"], []).append(f)
            plan.n_files_small += 1
    for d in sorted(by_dir):
        small = sorted(by_dir[d], key=lambda f: (-f["bytes"], f["file"]))
        if len(small) < 2:
            continue
        bins: list[dict] = []
        for f in small:
            placed = False
            for b in bins:
                if b["bytes"] + f["bytes"] <= target_bytes:
                    b["files"].append(f["file"])
                    b["bytes"] += f["bytes"]
                    placed = True
                    break
            if not placed:
                bins.append({"dir": d, "files": [f["file"]], "bytes": f["bytes"]})
        plan.bins.extend(b for b in bins if len(b["files"]) >= 2)
    return plan


def _journal_path(root: str, token: str) -> str:
    return f"{root}/_compact_journal_{token}.json"


def _write_text(fs, jvm, path: str, text: str) -> None:
    out = fs.create(jvm.org.apache.hadoop.fs.Path(path), True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def _read_text(fs, jvm, path: str) -> str:
    inp = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        jbr = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(inp, "UTF-8"))
        lines = []
        line = jbr.readLine()
        while line is not None:
            lines.append(line)
            line = jbr.readLine()
        return "\n".join(lines)
    finally:
        inp.close()


def _move(fs, jvm, src: str, dst: str) -> None:
    p = jvm.org.apache.hadoop.fs.Path
    dst_path = p(dst)
    parent = dst_path.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    if not fs.rename(p(src), dst_path):
        raise IOError(f"compaction: rename failed {src} -> {dst}")


def _stage_one_bin(
    spark: SparkSession,
    files: list[str],
    bin_dir: str,
    sort_cols: list[str] | None,
) -> str:
    """Stage ONE bin: mergeSchema union of its files → coalesce(1)
    (+ optional layout sort) → ``bin_dir``; validates the staged rows
    against a fresh source count and that exactly one parquet file was
    produced.  Returns the staged file's path.  Shared by the per-bin
    strategy and the grouped strategy's zero-row-bin fallback so the
    (read, coalesce, verify, expect-one-file) sequence lives once."""
    src = spark.read.option("mergeSchema", "true").parquet(*files)
    staged_df = src.coalesce(1)
    if sort_cols:
        # compaction is the moment to fix layout: sorting each bin
        # tightens the compacted file's min/max footer stats so later
        # filtered scans prune it (for multi-column curves rewrite
        # with layout.write_zordered instead)
        staged_df = staged_df.sortWithinPartitions(*sort_cols)
    staged_df.write.mode("overwrite").parquet(bin_dir)
    n_src = src.count()
    n_staged = spark.read.parquet(bin_dir).count()
    if n_staged != n_src:
        raise IOError(
            f"compaction: staged bin {bin_dir} holds {n_staged} rows, "
            f"sources hold {n_src} — aborting before any original is touched"
        )
    part = [
        f for f in dataset_files(spark, bin_dir) if f["file"].endswith(".parquet")
    ]
    if len(part) != 1:
        raise IOError(f"compaction: expected 1 staged file in {bin_dir}")
    return part[0]["file"]


def _stage_per_bin(
    spark: SparkSession,
    plan: CompactionPlan,
    root: str,
    staging: str,
    trash: str,
    token: str,
    sort_cols: list[str] | None,
) -> tuple[list[dict], list[dict]]:
    """Phase-1 strategy A: one coalesce(1) job per bin.  Simple and
    schema-tight (mergeSchema unions only WITHIN a bin), but a 10⁴-bin
    backlog pays 10⁴ job-scheduling latencies — use ``_stage_grouped``
    for large backlogs."""
    moves = []       # staged file -> live destination
    originals = []   # live original -> trash slot
    for i, b in enumerate(plan.bins):
        staged = _stage_one_bin(spark, b["files"], f"{staging}/bin{i:05d}", sort_cols)
        live_dir = f"{root}/{b['dir']}" if b["dir"] else root
        moves.append(
            {
                "src": staged,
                "dst": f"{live_dir}/compacted-{token}-{i:05d}.parquet",
            }
        )
        for j, orig in enumerate(b["files"]):
            originals.append({"src": orig, "dst": f"{trash}/{i:05d}-{j:05d}.parquet"})
    return moves, originals


def _stage_grouped(
    spark: SparkSession,
    plan: CompactionPlan,
    root: str,
    staging: str,
    trash: str,
    token: str,
    sort_cols: list[str] | None,
) -> tuple[list[dict], list[dict]]:
    """Phase-1 strategy B: ONE job per directory writes ALL of the
    directory's bins — each source row is tagged with its bin id (file →
    bin broadcast lookup on the file's basename, unique within one FS
    directory), repartitioned BY the bin id so every bin's rows land in
    exactly one task, and written ``partitionBy('__bin')`` so each bin
    becomes one file.  A 10⁴-bin backlog costs |directories| jobs instead
    of 10⁴ — wall-time ~constant in bin count at fixed bytes (SCALE.md).

    Same invariants as per-bin staging, checked before anything is
    journaled: per-bin staged row counts (read BACK from the staging dir)
    equal the expected source counts, the tag join can drop zero rows
    (coverage validated driver-side from per-file counts BEFORE the write
    job runs), and every bin staged exactly one file.  Schema note:
    mergeSchema unions columns across the DIRECTORY's small files (per-bin
    mode unions only within a bin) — fragments from before a schema
    evolution gain the new columns as nulls, same semantics at directory
    grain.  A bin whose sources hold zero rows cannot be staged by
    partitionBy (no rows → no directory); those bins are absorbed here by
    staging them through the per-bin empty-write path (one coalesce(1)
    write of the bin's — empty — union, same journaled moves), so
    delete-heavy directories full of empty fragments never abort the
    grouped mode.

    Read budget per directory: ONE column-pruned count pass over the
    small files (footer-driven — count(1) grouped by input_file_name
    reads no column data) + the staging write's scan, down from the three
    source scans of the r10 implementation (write + tagged-count +
    src.count).  The staged read-back stays: it is the invariant that
    validates the WRITE, not the plan."""
    from pyspark.sql import functions as F

    by_dir: dict[str, list[tuple[int, dict]]] = {}
    for i, b in enumerate(plan.bins):
        by_dir.setdefault(b["dir"], []).append((i, b))
    moves = []
    originals = []
    for k, d in enumerate(sorted(by_dir)):
        dir_bins = by_dir[d]
        name_to_bin = []
        all_files = []
        for i, b in dir_bins:
            for f in b["files"]:
                name_to_bin.append((posixpath.basename(f), i))
                all_files.append(f)
        bin_of = dict(name_to_bin)
        src = spark.read.option("mergeSchema", "true").parquet(*all_files)
        # ONE validation scan, before any write: per-file row counts.
        # count(1) by input_file_name is column-pruned to nothing — the
        # vectorized reader serves it from row-group metadata.  Driver-side
        # sums give (a) per-bin expected counts, (b) the total source
        # count, and (c) join coverage: a scanned basename missing from the
        # mapping is exactly the row the tag join would silently drop.
        fcounts = {
            r["__fname"]: r["n"]
            for r in src.groupBy(
                F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__fname")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        unknown = sorted(set(fcounts) - set(bin_of))
        if unknown:
            raise IOError(
                f"compaction: scanned files {unknown} in {d or '<root>'} have "
                "no bin mapping — the tag join would drop their rows; "
                "aborting before any original is touched"
            )
        expected = {i: 0 for i, _ in dir_bins}
        for fname, n in fcounts.items():
            expected[bin_of[fname]] += n
        nonzero_bins = [(i, b) for i, b in dir_bins if expected[i] > 0]
        zero_bins = [(i, b) for i, b in dir_bins if expected[i] == 0]

        gstage = f"{staging}/grp{k:05d}"
        if nonzero_bins:
            mapping = F.broadcast(
                spark.createDataFrame(name_to_bin, "__fname string, __bin int")
            )
            tagged = (
                src.withColumn(
                    "__fname", F.element_at(F.split(F.input_file_name(), "/"), -1)
                )
                .join(mapping, "__fname")
                .drop("__fname")
            )
            out = tagged.repartition(len(nonzero_bins), F.col("__bin"))
            if sort_cols:
                # __bin leads the sort so hash-colliding bins sharing a task
                # stay contiguous; partitionBy preserves in-partition order,
                # so each bin's file ends up sorted by sort_cols (same
                # layout contract as per-bin mode)
                out = out.sortWithinPartitions("__bin", *sort_cols)
            out.write.partitionBy("__bin").mode("overwrite").parquet(gstage)
            # the write-validating invariant: staged counts read back from
            # disk equal the expected per-bin counts
            staged = {
                r["__bin"]: r["n"]
                for r in spark.read.parquet(gstage)
                .groupBy("__bin")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            want = {i: expected[i] for i, _ in nonzero_bins}
            if staged != want:
                raise IOError(
                    f"compaction: staged bin counts {staged} != source counts "
                    f"{want} in {gstage} — aborting before any original is "
                    "touched"
                )
        # zero-row bins: partitionBy cannot stage them (no rows → no
        # directory), so each falls back to the per-bin staging helper —
        # one empty coalesce(1) write producing a single schema-bearing
        # empty parquet file.  Still a win (N empty fragments collapse to
        # one file) and cheap by construction (the scans read zero rows);
        # these are the rare tail of a delete-heavy day, so the per-bin
        # job latency grouped mode amortizes does not return here.  The
        # helper's own src==staged count check also self-corrects a stale
        # fcount: a "zero" bin that actually holds rows simply stages
        # them (the bin's files are in NO other bin, so nothing is lost
        # or doubled).
        zstaged: dict[int, str] = {}
        for i, b in zero_bins:
            zstaged[i] = _stage_one_bin(
                spark, b["files"], f"{staging}/bin{i:05d}", sort_cols
            )
        live_dir = f"{root}/{d}" if d else root
        for i, b in dir_bins:
            if i in zstaged:
                staged_file = zstaged[i]
            else:
                part = [
                    f
                    for f in dataset_files(spark, f"{gstage}/__bin={i}")
                    if f["file"].endswith(".parquet")
                ]
                if len(part) != 1:
                    raise IOError(
                        f"compaction: expected 1 staged file in "
                        f"{gstage}/__bin={i}, found {len(part)}"
                    )
                staged_file = part[0]["file"]
            moves.append(
                {
                    "src": staged_file,
                    "dst": f"{live_dir}/compacted-{token}-{i:05d}.parquet",
                }
            )
            for j, orig in enumerate(b["files"]):
                originals.append(
                    {"src": orig, "dst": f"{trash}/{i:05d}-{j:05d}.parquet"}
                )
    return moves, originals


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_bytes: int,
    small_bytes: int | None = None,
    dry_run: bool = False,
    sort_cols: list[str] | None = None,
    grouped: bool = False,
    _crash_after: str | None = None,
) -> dict:
    """Plan and (unless ``dry_run``) execute compaction of ``path``.

    Returns the plan summary + {'executed': bool}.  Only the bins' files
    are read — the data read is exactly the small-file tail, never the
    right-sized bulk.  ``grouped=False`` (default) rewrites each bin with
    its own coalesce(1) job; ``grouped=True`` writes all of a directory's
    bins in ONE job via a bin-id column (see ``_stage_grouped``) — the
    day-2 mode for large backlogs where per-bin job latency dominates.
    Both strategies produce identical journaled moves, so recovery and
    idempotence are strategy-independent.  Safe to re-run: an
    already-compacted dataset plans zero bins (idempotent), and an
    interrupted run is repaired by ``recover_compaction`` (the journal
    names every pending move).

    ``_crash_after`` (tests only): raise after the named phase
    ('staged' | 'journal' | 'trashed') to exercise the recovery paths.
    """
    files = dataset_files(spark, path)
    plan = compaction_plan(files, target_bytes, small_bytes)
    result = plan.summary()
    result["executed"] = False
    if dry_run or not plan.bins:
        return result

    fs, jroot, jvm = _fs(spark, path)
    root = fs.getFileStatus(jroot).getPath().toString()
    token = uuid.uuid4().hex[:12]
    staging = f"{root}/_compact_staging_{token}"
    trash = f"{root}/_compact_trash_{token}"

    # Phase 1: stage every bin (data jobs — the only non-metadata work).
    # mergeSchema: fragments written across a schema evolution must union
    # their columns — picking one file's schema would silently DROP the
    # others' extra columns and phase 3 then destroys the originals.  The
    # row-count checks are the cheap invariant that the staged bins hold
    # every source row before anything is journaled (abort here leaves
    # only an invisible underscore-prefixed staging dir).
    stage = _stage_grouped if grouped else _stage_per_bin
    moves, originals = stage(spark, plan, root, staging, trash, token, sort_cols)
    if _crash_after == "staged":
        raise RuntimeError("injected crash after staging")

    # Phase 2: journal — from here recovery can finish or undo everything.
    # Written tmp-then-rename: a crash mid-write must never leave a
    # truncated journal that recover_compaction cannot parse.
    journal = {"token": token, "moves": moves, "originals": originals,
               "staging": staging, "trash": trash}
    tmp = f"{staging}/journal.tmp"
    _write_text(fs, jvm, tmp, json.dumps(journal))
    _move(fs, jvm, tmp, _journal_path(root, token))
    if _crash_after == "journal":
        raise RuntimeError("injected crash after journal")

    # Phase 3: metadata moves — originals out, bins in, cleanup.
    for m in originals:
        _move(fs, jvm, m["src"], m["dst"])
    if _crash_after == "trashed":
        raise RuntimeError("injected crash after trashing originals")
    for m in moves:
        _move(fs, jvm, m["src"], m["dst"])
    _cleanup(fs, jvm, journal, root)
    result["executed"] = True
    return result


def _cleanup(fs, jvm, journal: dict, root: str) -> None:
    p = jvm.org.apache.hadoop.fs.Path
    fs.delete(p(journal["trash"]), True)
    fs.delete(p(journal["staging"]), True)
    fs.delete(p(_journal_path(root, journal["token"])), False)


def compaction_due(
    spark: SparkSession,
    path: str,
    target_bytes: int,
    *,
    max_small_frac: float = 0.3,
    min_small_files: int = 8,
    small_bytes: int | None = None,
) -> dict:
    """The maintenance-policy trigger: is this dataset's small-file tail
    worth a compaction run?  One FS listing, no data read.  Returns
    {n_files, n_small, small_frac, files_removable, due} — due when the
    small-file FRACTION exceeds ``max_small_frac`` AND at least
    ``min_small_files`` small files exist (a 4-file dataset is never worth
    a job), using the same plan the run itself would execute."""
    files = dataset_files(spark, path)
    plan = compaction_plan(files, target_bytes, small_bytes)
    n = len(files)
    small_frac = (plan.n_files_small / n) if n else 0.0
    return {
        "n_files": n,
        "n_small": plan.n_files_small,
        "small_frac": small_frac,
        "files_removable": plan.summary()["files_removed"],
        "due": bool(
            n
            and plan.n_files_small >= min_small_files
            and small_frac > max_small_frac
            and plan.bins
        ),
    }


def maintain_dataset(
    spark: SparkSession,
    path: str,
    target_bytes: int,
    *,
    max_small_frac: float = 0.3,
    min_small_files: int = 8,
    small_bytes: int | None = None,
    grouped: bool = True,
    sort_cols: list[str] | None = None,
) -> dict:
    """The closed day-2 maintenance loop in one call (the
    ``refresh_ivf_index`` discipline): (1) repair any interrupted runs —
    every pending journal rolls forward or back so the dataset is in a
    known state before new work; (2) evaluate ``compaction_due`` (one FS
    listing, no data read); (3) when due, execute the compaction —
    grouped by default, the large-backlog mode.  Returns
    {recovered: [(token, direction)], due: <trigger dict>, executed,
    ...plan summary when executed}.  Idempotent: a second call on a
    just-maintained dataset recovers nothing and plans zero bins."""
    recovered = [
        (token, recover_compaction(spark, path, token))
        for token in pending_compactions(spark, path)
    ]
    verdict = compaction_due(
        spark, path, target_bytes,
        max_small_frac=max_small_frac,
        min_small_files=min_small_files,
        small_bytes=small_bytes,
    )
    out: dict = {"recovered": recovered, "due": verdict, "executed": False}
    if verdict["due"]:
        out.update(
            compact_dataset(
                spark, path, target_bytes,
                small_bytes=small_bytes, sort_cols=sort_cols, grouped=grouped,
            )
        )
    return out


def pending_compactions(spark: SparkSession, path: str) -> list[str]:
    """Journal tokens of interrupted compaction runs under ``path``."""
    fs, jroot, _ = _fs(spark, path)
    root = fs.getFileStatus(jroot).getPath().toString()
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if name.startswith("_compact_journal_") and name.endswith(".json"):
            out.append(name[len("_compact_journal_"):-len(".json")])
    return sorted(out)


def recover_compaction(spark: SparkSession, path: str, token: str) -> str:
    """Repair an interrupted run.  Roll FORWARD when every original is
    already in trash (phase 3 was underway — finish the staged moves and
    clean up); roll BACK otherwise (restore any trashed originals, drop
    staging).  Returns 'forward' or 'back'.  Idempotent: missing sources
    whose destinations exist are treated as already-moved."""
    fs, jroot, jvm = _fs(spark, path)
    root = fs.getFileStatus(jroot).getPath().toString()
    journal = json.loads(_read_text(fs, jvm, _journal_path(root, token)))
    p = jvm.org.apache.hadoop.fs.Path

    # Completed run whose _cleanup died between the trash delete and the
    # journal delete: every move landed, nothing in trash — the dataset is
    # in the POST-compaction state, so finishing forward (a cleanup no-op
    # plus the journal delete) is the truthful verdict; the roll-back
    # branch below would no-op the files but *report* 'back'.
    completed = (
        all(fs.exists(p(m["dst"])) for m in journal["moves"])
        and not any(fs.exists(p(m["src"])) for m in journal["originals"])
        and not any(fs.exists(p(m["dst"])) for m in journal["originals"])
    )
    if completed:
        _cleanup(fs, jvm, journal, root)
        return "forward"

    all_trashed = all(
        fs.exists(p(m["dst"])) or not fs.exists(p(m["src"]))
        for m in journal["originals"]
    ) and any(fs.exists(p(m["dst"])) for m in journal["originals"])
    if all_trashed:
        for m in journal["moves"]:
            if fs.exists(p(m["src"])) and not fs.exists(p(m["dst"])):
                _move(fs, jvm, m["src"], m["dst"])
        _cleanup(fs, jvm, journal, root)
        return "forward"
    for m in journal["originals"]:
        if fs.exists(p(m["dst"])) and not fs.exists(p(m["src"])):
            _move(fs, jvm, m["dst"], m["src"])
    _cleanup(fs, jvm, journal, root)
    return "back"
