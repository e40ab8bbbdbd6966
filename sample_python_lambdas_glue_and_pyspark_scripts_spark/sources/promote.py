"""Checked-rename promote: the one directory-swap discipline every
persisted artifact shares.

The engine persists several incrementally-maintained artifacts — the
versioned-catalog pointer table (``operators/versioning.py``), the
streaming MinHash claimed-fingerprint history and its compactions
(``streaming/minhash_dedup.py``), the HLL register store
(``streaming/sketch_state.py``) — and each needs the same guarantee
when it replaces a live directory: **the old content survives until the
new content is in place**. Hadoop ``FileSystem.rename`` reports failure
through its RETURN VALUE, not an exception, so a naive
``rename(target, bak); rename(tmp, target)`` can silently drop the
artifact if the second rename fails (CLAUDE.md hard-won constraint).
Before round 7 each site hand-rolled this swap; this module is the
single shared implementation.

Sequence (single-writer per artifact, as everywhere in SURVEY §4.3):

1. caller materializes the NEW content at ``tmp`` (complete write —
   parquet ``_SUCCESS`` discipline is the writer's);
2. crash recovery: a leftover backup with NO live target means a prior
   run died between its two renames — restore the backup first, so the
   pre-crash state is live before this run's swap begins;
3. ``rename(target, backup)`` (checked) — the old content is now the
   backup, never deleted yet;
4. ``rename(tmp, target)`` (checked) — on failure the backup is
   restored and the error raised: the artifact is never lost, at worst
   the promote is rolled back;
5. only now delete the backup.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """``(fs, Path)`` for ``path``'s filesystem — the py4j handles every
    swap site needs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def recover_backup(
    spark: SparkSession,
    target: str,
    backup: str | None = None,
    error_cls: type[Exception] = IOError,
) -> bool:
    """Crash recovery for a promote site: a leftover backup with NO
    live target means a prior run died between its two renames and the
    backup is the only complete copy — restore it. A backup WITH a live
    target is stale cleanup debris — delete it. Call this BEFORE
    reading ``target`` to build new content (``promote_swap`` also runs
    it, but by then the caller's read lineage may already have resolved
    against the missing path). Returns True if a restore happened."""
    backup = backup or f"{target}__old"
    fs, hpath = hadoop_fs(spark, target)
    t, b = hpath(target), hpath(backup)
    if not fs.exists(b):
        return False
    if not fs.exists(t):
        if not fs.rename(b, t):
            raise error_cls(
                f"recover_backup: cannot restore {backup} to {target}"
            )
        return True
    fs.delete(b, True)
    return False


def promote_swap(
    spark: SparkSession,
    target: str,
    write_tmp,
    tmp: str | None = None,
    backup: str | None = None,
    error_cls: type[Exception] = IOError,
    _crash_hook=None,
) -> None:
    """Atomically-as-the-FS-allows replace ``target`` with freshly
    written content, keeping the old content as a backup until the new
    content is live.

    ``write_tmp(tmp_path)`` materializes the new content (called first;
    any failure there leaves the live target untouched). ``tmp`` /
    ``backup`` default to dot-prefixed siblings of ``target``.
    ``error_cls`` is raised on a failed rename (after restoring the
    backup). ``_crash_hook`` is test-only fault injection, invoked at
    the most dangerous instant — after the target was moved aside,
    before the new content was promoted; an exception from it triggers
    the same restore path a failed promote rename does.
    """
    tmp = tmp or f"{target}__new"
    backup = backup or f"{target}__old"
    fs, hpath = hadoop_fs(spark, target)
    t, b, n = hpath(target), hpath(backup), hpath(tmp)

    recover_backup(spark, target, backup, error_cls)

    fs.delete(n, True)
    write_tmp(tmp)

    had_target = fs.exists(t)
    if had_target and not fs.rename(t, b):
        raise error_cls(
            f"promote_swap: cannot move {target} aside to {backup}"
        )
    try:
        if _crash_hook is not None:
            _crash_hook()
    except BaseException:
        if had_target:
            fs.rename(b, t)
        raise
    if not fs.rename(n, t):
        if had_target:
            fs.rename(b, t)  # restore; original state intact
        raise error_cls(f"promote_swap: cannot promote {tmp} to {target}")
    fs.delete(b, True)
