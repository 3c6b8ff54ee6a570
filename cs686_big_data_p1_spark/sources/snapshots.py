"""Versioned snapshot tables (time travel) on plain parquet.

The reference's publish step replaces a file's chunk list atomically
under a lock (controller/FileTable.java's synchronized publish);
lakehouse formats generalize that to versioned table snapshots. This
module provides the same contract with nothing but parquet and one
atomic filesystem rename per commit — no table-format dependency:

  * every commit writes a full snapshot under ``<table>/v=NNNNNNNN/``,
    staged in a hidden temp dir and RENAMED into place (rename is the
    atomic primitive on HDFS-compatible stores and POSIX alike), so a
    reader can never observe a half-written version;
  * the current version is simply the highest published directory —
    no manifest file to corrupt. Hadoop's ``FileSystem.rename`` is NOT
    a CAS when the destination directory exists (it moves the source
    INTO it and reports success), so the publish is a *verified* CAS:
    each committer stages under a uuid-unique dir carrying a unique
    commit-marker file, renames, then checks the marker sits directly
    under the final path. A loser finds its whole stage dir nested
    inside the winner's version, pulls it back out, and retries with
    the next number — no commit is ever silently dropped;
  * readers pin a version (time travel) or take the latest; a reader
    holding version N is unaffected by later commits or by vacuum of
    OTHER versions (immutable snapshot isolation).

Scale: a commit's cost is the snapshot write itself (parallel across
executors); version discovery is one driver-side directory listing of
O(#versions) names — the same metadata cost any table format pays.
For mostly-unchanged data, pair with ``upsert_parquet_partitioned``
(partition-scoped rewrites) and snapshot the partition directories
instead; this module keeps whole-table semantics deliberately simple.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

_WIDTH = 8  # zero-padded version directory suffix


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), p, jvm


def snapshot_versions(spark: SparkSession, table_path: str) -> list[int]:
    """Published versions, ascending. Hidden staging dirs are invisible
    (dot-prefixed names are filtered, and Spark ignores them anyway)."""
    fs, p, _ = _fs(spark, table_path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def _publish_stage(
    spark: SparkSession, table_path: str, token: str
) -> int:
    """The verified-CAS loop: rename ``<table>/.stage-<token>`` (which
    must already contain its ``_commit-<token>`` marker) onto the next
    free version number until the marker is observed directly under the
    final path. Shared by write_snapshot and recover_stranded_stages.

    CRASH WINDOW (ADVICE r7): if this process dies after losing a race
    (its stage renamed INTO the winner's version) but before the
    pull-back rename below, the stage dir is stranded NESTED inside a
    published version — dot-prefixed, so invisible to readers and to
    snapshot_versions. The commit is not silently lost forever, but it
    needs recover_stranded_stages() to surface/republish it; vacuum
    also reports such dirs instead of deleting them blind."""
    fs, root, jvm = _fs(spark, table_path)
    jpath = jvm.org.apache.hadoop.fs.Path
    stage = f"{table_path}/.stage-{token}"
    marker = f"_commit-{token}"
    fs.mkdirs(root)  # rename needs an existing destination parent
    while True:
        if not fs.exists(jpath(stage)):
            # The stage is gone (checked BEFORE renaming: local-FS
            # rename THROWS on a missing source rather than returning
            # false). If a janitor ADOPTED it (the committer stalled
            # past min_age and recover_stranded_stages republished on
            # its behalf), the commit actually LANDED — find our
            # marker under a published version and report that version
            # instead of an error, or the caller would retry
            # write_snapshot and commit the same data twice (review r8).
            for pv in snapshot_versions(spark, table_path):
                pdir = f"{table_path}/v={pv:0{_WIDTH}d}"
                if fs.exists(jpath(f"{pdir}/{marker}")):
                    return pv
            # Not yet published — but maybe not deleted either
            # (ADVICE r8): a janitor that ADOPTED this stage can
            # itself lose a publish race, leaving the stage
            # momentarily NESTED inside another committer's version
            # awaiting pull-back. Raising here would make the caller
            # retry write_snapshot and double-commit once the
            # janitor's republish lands. We own the token, so pull
            # the nested stage back to the root ourselves (the same
            # recovery the race loser below performs) and keep
            # driving the CAS; a failed pull-back means the janitor
            # moved it concurrently — re-enter the loop and re-look.
            nested_stage = None
            for s in find_stranded_stages(spark, table_path):
                if s["token"] == token and s["nested_in"] is not None:
                    nested_stage = s["path"]
                    break
            if nested_stage is not None:
                fs.rename(jpath(nested_stage), jpath(stage))
                continue
            raise IOError(
                f"snapshot commit: stage dir {stage} disappeared "
                "mid-publish and its marker is under no published "
                "version nor any nested stage — the stage was "
                "deleted, not adopted"
            )
        vs = snapshot_versions(spark, table_path)
        v = (vs[-1] if vs else 0) + 1
        final = f"{table_path}/v={v:0{_WIDTH}d}"
        if fs.exists(jpath(final)):
            continue  # published between listing and here; re-list
        try:
            renamed = fs.rename(jpath(stage), jpath(final))
        except Exception:  # noqa: BLE001 — source vanished in the race
            continue  # loop re-enters the stage-existence branch
        if renamed and fs.exists(jpath(f"{final}/{marker}")):
            return v  # marker directly under final ⇒ we own this version
        if renamed:
            # Lost: rename moved the stage dir INTO the winner's
            # version. Pull it back out, intact, and retry.
            nested = f"{final}/.stage-{token}"
            if not fs.rename(jpath(nested), jpath(stage)):
                raise IOError(
                    f"snapshot commit race: could not recover stage "
                    f"dir from {nested}"
                )
        # renamed == False with the stage intact (e.g. dst appeared
        # with rename semantics that do fail on existing dst): retry.


def write_snapshot(spark: SparkSession, df: DataFrame, table_path: str) -> int:
    """Commit df as the next version; return its number.

    Verified-CAS publish: the snapshot is written ONCE to a
    uuid-unique stage dir containing a unique ``_commit-<token>``
    marker; each attempt renames the stage onto the next free version
    and then verifies the marker sits directly under that version
    path. ``FileSystem.rename`` onto an existing directory moves the
    stage INSIDE it and still returns true (observed on local FS; HDFS
    behaves the same), so the rename result alone proves nothing — the
    marker check is what decides the race. A loser recovers its intact
    stage dir from inside the winner's version and retries with the
    next number, so no LIVE concurrent commit is ever silently lost
    (for the crash window, see _publish_stage / recover_stranded_stages)."""
    token = uuid.uuid4().hex
    stage = f"{table_path}/.stage-{token}"
    fs, _, jvm = _fs(spark, table_path)
    df.write.mode("overwrite").parquet(stage)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{stage}/_commit-{token}")
    ).close()
    return _publish_stage(spark, table_path, token)


def find_stranded_stages(
    spark: SparkSession, table_path: str
) -> list[dict]:
    """Janitor scan (ADVICE r7 low): every ``.stage-<token>`` dir left
    behind by a crashed committer, with enough metadata to decide its
    fate. Two locations exist:

      * at the TABLE ROOT — the committer died before winning a rename
        (or right after a pull-back). ``complete`` iff its commit
        marker exists (the marker is created only after the parquet
        write finishes, so no marker ⇒ the snapshot data is partial);
      * NESTED inside a published version — the committer died inside
        the race-recovery window. Always complete (a stage only
        reaches a rename with its marker in place) and represents a
        fully-written commit that was never published.

    Returns [{"path", "token", "nested_in" (version or None),
    "complete", "mtime_ms"}], oldest first. mtime_ms is the NEWEST
    modification time anywhere in the stage TREE, not the stage dir's
    own mtime: a parquet write in progress keeps touching files deep
    under _temporary/ while the top dir's mtime stays at write start,
    and an age check on the top dir alone would misread a slow live
    write (> min_age) as a crashed stage and destroy it."""
    fs, p, jvm = _fs(spark, table_path)
    jpath = jvm.org.apache.hadoop.fs.Path

    def tree_mtime(path: str, top_ms: int) -> int | None:
        """Newest mtime in the tree, or None if the tree vanished
        mid-listing (a concurrent committer renamed the stage onto a
        version, or a live parquet write committed a task and removed
        its _temporary dir) — a vanished stage is simply not stranded,
        and a half-listed one is ACTIVE, so the caller must skip it
        rather than crash vacuum/recovery (review r8; the lazy
        recursive iterator throws on paths deleted under it)."""
        newest = top_ms
        try:
            it = fs.listFiles(jpath(path), True)
            while it.hasNext():
                newest = max(newest, it.next().getModificationTime())
        except Exception:  # noqa: BLE001 — Py4J FileNotFound et al.
            return None
        return newest

    if not fs.exists(p):
        return []
    found: list[dict] = []

    def scan(dir_path: str, nested_in: int | None) -> None:
        for st in fs.listStatus(jpath(dir_path)):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(".stage-"):
                token = name[len(".stage-"):]
                full = f"{dir_path}/{name}"
                mt = tree_mtime(full, st.getModificationTime())
                if mt is None:
                    continue  # vanished/actively-moving: not stranded
                found.append(
                    {
                        "path": full,
                        "token": token,
                        "nested_in": nested_in,
                        "complete": fs.exists(
                            jpath(f"{full}/_commit-{token}")
                        ),
                        "mtime_ms": mt,
                    }
                )

    scan(table_path, None)
    for v in snapshot_versions(spark, table_path):
        scan(f"{table_path}/v={v:0{_WIDTH}d}", v)
    return sorted(found, key=lambda d: d["mtime_ms"])


def recover_stranded_stages(
    spark: SparkSession, table_path: str, min_age_ms: int = 3_600_000
) -> dict[str, int | None]:
    """Republish or discard crashed committers' stage dirs. Only stages
    older than ``min_age_ms`` (default 1 h) are touched — a younger one
    may belong to a committer that is still running its CAS loop.

    COMPLETE stages (marker present, whether nested or at the root) are
    pulled back to the table root and re-driven through the same
    verified-CAS publish, so the crashed commit finally lands as a real
    version — upholding "no commit is silently dropped" across process
    death. INCOMPLETE root stages (no marker: the parquet write itself
    died) are deleted. Returns {stage_path: new_version | None
    (deleted)}; untouched young stages are simply absent."""
    fs, _, jvm = _fs(spark, table_path)
    jpath = jvm.org.apache.hadoop.fs.Path
    now_ms = jvm.java.lang.System.currentTimeMillis()
    out: dict[str, int | None] = {}
    for s in find_stranded_stages(spark, table_path):
        if now_ms - s["mtime_ms"] < min_age_ms:
            continue
        if not s["complete"]:
            fs.delete(jpath(s["path"]), True)
            out[s["path"]] = None
            continue
        root_stage = f"{table_path}/.stage-{s['token']}"
        if s["nested_in"] is not None and not fs.rename(
            jpath(s["path"]), jpath(root_stage)
        ):
            raise IOError(f"could not un-nest stranded stage {s['path']}")
        out[s["path"]] = _publish_stage(spark, table_path, s["token"])
    return out


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The table as of `version` (latest when None)."""
    vs = snapshot_versions(spark, table_path)
    if not vs:
        raise FileNotFoundError(f"no published versions under {table_path}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(f"version {version} not in {vs}")
    return spark.read.parquet(f"{table_path}/v={version:0{_WIDTH}d}")


def vacuum_snapshots(
    spark: SparkSession, table_path: str, keep_last: int
) -> list[int]:
    """Drop all but the newest keep_last versions; return what was
    removed. Readers pinned to a surviving version are unaffected
    (snapshots are immutable); keep_last >= 1 always holds the
    latest."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, _, jvm = _fs(spark, table_path)
    vs = snapshot_versions(spark, table_path)
    drop = vs[:-keep_last]
    # Janitor guard (ADVICE r7 low): a version slated for deletion may
    # hide a crashed committer's COMPLETE stage dir — an unpublished
    # commit. Deleting it blind would turn the crash window into real
    # data loss; surface it instead.
    doomed = {
        s["path"]
        for s in find_stranded_stages(spark, table_path)
        if s["complete"] and s["nested_in"] in set(drop)
    }
    if doomed:
        raise IOError(
            "vacuum would delete unpublished commit(s) stranded by a "
            f"crashed committer: {sorted(doomed)} — run "
            "recover_stranded_stages() first"
        )
    for v in drop:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={v:0{_WIDTH}d}"),
            True,
        )
    return drop


def snapshot_diff(
    spark: SparkSession,
    table_path: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two published versions: one
    null-safe FULL OUTER join on the key, emitting one row per changed
    key with `change_type` in {inserted, deleted, updated} and the
    old_/new_ value columns side by side (unchanged keys are filtered
    out). The lakehouse "table_changes()" surface, derived from plain
    immutable snapshots — no change log needed because versions are
    full copies (pair with `inventory_delta` for the aggregated-delta
    shape).

    Exactness: column comparison is null-safe equality on raw values —
    no arithmetic, so the verdict is deterministic across engines and
    retries. Scale: the join shuffles on the key (or broadcasts the
    smaller snapshot under AQE); comparison is one codegen'd projection.
    Fails fast if the two snapshots disagree on schema (a schema change
    is not a row diff)."""
    old = read_snapshot(spark, table_path, v_old)
    new = read_snapshot(spark, table_path, v_new)
    if old.schema != new.schema:
        raise ValueError(
            f"snapshot_diff: schema changed between v{v_old} and "
            f"v{v_new}: {old.schema.simpleString()} vs "
            f"{new.schema.simpleString()}"
        )
    from pyspark.sql import functions as F

    val_cols = [c for c in old.columns if c not in key_cols]
    # presence is tracked with explicit markers, NOT key nullness —
    # NULL is a legal (null-safely joined) key value, and reading
    # absence off a NULL key would misreport an unchanged NULL-keyed
    # row as deleted (review r8)
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in val_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in val_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    same = F.lit(True)
    for c in val_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_new, "deleted")
        .when(~in_old, "inserted")
        .when(~same, "updated")
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(f"_ko_{k}", f"_kn_{k}").alias(k)
                for k in key_cols
            ],
            "change_type",
            *[c for pair in (
                (f"old_{c}", f"new_{c}") for c in val_cols
            ) for c in pair],
        )
    )
