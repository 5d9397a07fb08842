"""Bucketed table helpers: co-located joins/aggregations without exchanges.

The relational sink's scale lever (EXPLAIN.md's Q18 note): persisting a
fact table bucketed by its join/group key lets every later
join-on-that-key or groupBy-that-key run with ZERO shuffle — the scan is
already hash-partitioned.  Spark bucketing rides the session catalog
(`saveAsTable`), so these helpers wrap the catalog plumbing and the
verification that a plan actually dropped its exchanges.

At 100 TB this is the difference between re-shuffling lineitem per query
and paying the shuffle once at ingest.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
    path: Optional[str] = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``path`` makes it an external table at that location (tests point this
    at a tmpdir; production points at the lake)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


# The ownership lease lives BESIDE the table directory
# (``<path>.lease``), not inside it: it must exist BEFORE the table
# write begins (saveAsTable can run for minutes, and an unleased
# in-progress directory would be reapable by a sibling whose pid probe
# can't see the writer across pid namespaces), and Spark's
# mode("overwrite") would wipe an in-dir file anyway.
_LEASE_SUFFIX = ".lease"


def _lease_path(table_dir: str) -> str:
    return table_dir + _LEASE_SUFFIX


def _proc_start_time(pid: int) -> Optional[str]:
    """The owner pid's kernel start time (clock ticks since boot, field
    22 of ``/proc/<pid>/stat``) — the cheap Linux-native way to tell a
    REUSED pid from the original owner.  Returns None when the pid is
    gone or /proc is unavailable (non-Linux)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            stat = fh.read().decode("ascii", "replace")
        # comm (field 2) is parenthesised and may itself contain spaces
        # or ')' — split AFTER the last ')' so fields stay aligned
        fields = stat.rsplit(")", 1)[1].split()
        return fields[19]  # field 22 overall; 20th after comm+state
    except (OSError, IndexError):
        return None


def _write_lease(path: str) -> None:
    import json
    import os
    import socket

    lease = {
        "host": socket.gethostname(),
        "boot_id": _boot_id(),
        "pid": os.getpid(),
        "start_time": _proc_start_time(os.getpid()),
    }
    try:
        with open(_lease_path(path), "w") as fh:
            json.dump(lease, fh)
    except OSError as exc:
        # an unleased dir degrades to the legacy pid probe on the reap
        # side — which is exactly the cross-namespace false-dead hazard
        # the lease exists to remove — so a failed write must be LOUD,
        # not silent, even though proceeding is still the right call
        # (refusing to write the table over a lease hiccup is worse)
        import warnings

        warnings.warn(
            f"ownership lease write failed ({exc}); {path} is only "
            "pid-probe-protected against sibling reaping for its "
            "lifetime",
            stacklevel=2,
        )


def _boot_id() -> Optional[str]:
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            return fh.read().strip()
    except OSError:
        return None


def _lease_owner_dead(stale: str, pid_from_name: int) -> bool:
    """True only when the lease PROVES the owning process is gone.

    The bare ``os.kill(pid, 0)`` probe is wrong in two directions on a
    shared filesystem: a container with its own pid namespace can hold a
    LIVE table whose pid looks dead here (rmtree'd out from under it),
    and pid reuse makes genuinely dead copies look alive forever (disk
    leak).  The lease pins host identity (hostname + boot_id) and the
    owner's kernel start time, so:

    - different host OR different boot_id -> NOT ours to judge; never
      reap.  (A differing boot_id does NOT prove death: two machines —
      cloned VMs are the classic case — can share a hostname while
      mounting one filesystem, so "previous boot of this host" is
      indistinguishable from "current boot of that host".  The cost is
      that dirs orphaned by a reboot are not auto-reaped; a disk leak
      beats deleting a live sibling's table, and rebooted-host cleanup
      is an operator action on the parent dir.);
    - same host+boot, pid gone -> dead, reap;
    - same host+boot, pid alive but start_time differs -> the pid was
      REUSED by an unrelated process; the owner is dead, reap;
    - boot identity unverifiable on either side (macOS / hardened
      containers without /proc boot_id) -> the hostname already
      matched, so degrade to the pid + start-time probe: disabling
      reaping wholesale there would leak one table copy per session
      forever;
    - malformed lease fields -> conservative: never reap;
    - no lease (pre-lease-era dir) -> fall back to the conservative
      old probe: reap only on ProcessLookupError.  Dirs leased by the
      earlier in-dir scheme are still honored via a fallback read.
    """
    import json
    import os
    import socket

    lease = None
    # sibling file first; fall back to the in-dir location one earlier
    # revision of this module wrote, so dirs leased under that scheme
    # keep their cross-namespace protection instead of degrading to the
    # bare pid probe
    for lp in (_lease_path(stale), os.path.join(stale, "_OWNER_LEASE.json")):
        try:
            with open(lp) as fh:
                lease = json.load(fh)
            break
        except (OSError, ValueError):
            continue
    if not isinstance(lease, dict):
        # a syntactically-valid but non-object lease ([], "x", 42) must
        # degrade to the conservative probe, not crash every session
        # sharing this parent path
        lease = None
    if lease is not None:
        try:
            if lease.get("host") != socket.gethostname():
                return False
            cur_boot = _boot_id()
            if (
                cur_boot is not None
                and lease.get("boot_id") is not None
                and lease.get("boot_id") != cur_boot
            ):
                # verifiably a DIFFERENT boot: not ours to judge (see
                # docstring — cloned-VM hostname collisions)
                return False
            # boot verified equal, or unverifiable on either side
            # (macOS/hardened containers have no /proc boot_id): the
            # hostname already matched, so degrade to the pid +
            # start-time probe rather than disabling reaping wholesale
            # — an unconditional False here would leak one full table
            # copy per session forever on such hosts
            pid = int(lease.get("pid") or pid_from_name)
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True
            except PermissionError:
                return False  # alive under another uid
            # pid exists — distinguish the owner from a recycled pid
            now = _proc_start_time(pid)
            recorded = lease.get("start_time")
            return bool(recorded and now and now != recorded)
        except (AttributeError, TypeError, ValueError, OverflowError, OSError):
            # malformed field values: conservative probe below.
            # OverflowError: a corrupt lease pid outside the C int range
            # makes os.kill raise it (not ValueError); OSError covers any
            # other kill/stat failure mode — the contract is 'malformed
            # lease -> conservative, never crash the session'.
            pass
    # legacy/incomplete dir: conservative probe only
    try:
        os.kill(pid_from_name, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        pass
    return False


def ensure_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int,
    sort_cols: Optional[List[str]] = None,
    path: Optional[str] = None,
) -> None:
    """``write_bucketed`` once; later calls with the same table name are
    no-ops.  This IS the bucketing contract — the shuffle is paid at
    INGEST, not per query — so consumers (q18_bucketed_twin, repeated
    bench runs) must not re-pay the write.  Callers own naming: the
    table name must encode everything the data depends on (the entries
    embed the sf-dir token), because an existing table is trusted as-is.

    External paths are made SESSION-unique
    (``<path>-pid<pid>-<uuid8>``): the catalog that gates the rewrite
    is per-session, so concurrent Spark processes — or multiple
    sessions within one process — would otherwise both see
    ``tableExists=False`` and race overwriting a shared location; a
    shared path buys nothing, since a fresh session rewrites
    regardless.  Cost: one table copy per live session under the
    parent dir; copies of DEAD processes are reaped on entry, live
    same-process siblings persist until the process exits.  Reaping is
    gated on an ownership LEASE (hostname + boot_id + pid start time,
    sibling file ``<dir>.lease``) so a shared filesystem mounted into
    several hosts/containers never loses a live sibling's table, and a
    reused pid can't pin a dead copy forever; dirs from other hosts or
    boots are left for their owners.  The lease is written BEFORE the
    table write starts — saveAsTable can run for minutes, and an
    unleased in-progress directory would otherwise sit reapable (via
    the legacy pid probe) for that whole window.
    """
    import glob
    import os
    import re
    import shutil
    import uuid

    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        return
    if path is not None:
        # reap siblings left by DEAD processes first, or every run
        # leaks a full table copy under the shared parent dir
        # (glob.escape: a path containing glob metacharacters must not
        # silently match nothing and defeat the reaping)
        for stale in glob.glob(glob.escape(path) + "-pid*"):
            if stale.endswith(_LEASE_SUFFIX):
                # lease files are handled with their table dir; a lease
                # whose dir never appeared (owner died before the write
                # started) is reaped by the same ownership test
                table_dir = stale[: -len(_LEASE_SUFFIX)]
                if not os.path.exists(table_dir):
                    m = re.search(r"-pid(\d+)(-[0-9a-f]{8})?$", table_dir)
                    if m and _lease_owner_dead(table_dir, int(m.group(1))):
                        try:
                            os.remove(stale)
                        except OSError:
                            pass
                continue
            m = re.search(r"-pid(\d+)(-[0-9a-f]{8})?$", stale)
            if not m:
                continue
            pid = int(m.group(1))
            if pid == os.getpid():
                continue
            # ownership lease (host + boot_id + pid start time) decides:
            # a bare pid probe would reap LIVE tables across pid
            # namespaces on a shared filesystem and leak dirs on pid
            # reuse (see _lease_owner_dead)
            if _lease_owner_dead(stale, pid):
                shutil.rmtree(stale, ignore_errors=True)
                try:
                    os.remove(_lease_path(stale))
                except OSError:
                    pass
        # pid + random suffix: pid isolates processes, the suffix
        # isolates multiple SparkSessions WITHIN one process (each has
        # its own catalog, so both would otherwise see
        # tableExists=False and overwrite one shared directory)
        path = f"{path}-pid{os.getpid()}-{uuid.uuid4().hex[:8]}"
        # lease FIRST: the write window must never be unprotected
        _write_lease(path)
    write_bucketed(
        df, table, bucket_cols, n_buckets, sort_cols=sort_cols, path=path
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the final physical plan —
    the thing bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
