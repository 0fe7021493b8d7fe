"""Disk-safe DuckDB connection setup shared by the oracle tools.

Round-14 postmortem: compare_oracle.py / cc_oracle.py pointed DuckDB at
/tmp/duckdb_spill with NO size cap and NO cleanup. A crashed sf10 oracle
run stranded 74 GB of duckdb_temp_storage-*.tmp, filled the sandbox disk
to 100%, and every subsequent driver gate run died on ENOSPC — the round's
CORRECTNESS/BENCH artifacts were lost to the gate's own spill. This module
makes that failure mode impossible:

  * ``max_temp_directory_size`` caps the spill (default 40 GB; override
    with GRAFT_SPILL_CAP for standalone heavy-oracle reruns),
  * the spill dir is swept of stale tmp files at connect time (a crashed
    previous run's debris does not survive into this one),
  * an ``atexit`` hook removes the spill dir when the process exits —
    including sys.exit() paths, which raise SystemExit past any finally
    blocks the callers forgot,
  * ``preflight`` fails fast with the usual suspects listed when free
    space is already too low for a gate run to succeed.
"""
import atexit, os, shutil, sys

import duckdb

SPILL_DIR = '/tmp/duckdb_spill'
_cleanup_registered = False


def _my_spill():
    """Per-PROCESS spill subdir: concurrent oracle tools must not sweep
    each other's live spill files."""
    return os.path.join(SPILL_DIR, f'pid{os.getpid()}')


def _sweep_spill():
    shutil.rmtree(_my_spill(), ignore_errors=True)
    _reap_dead()
    try:  # tidy the empty parent; harmless if another process holds it
        os.rmdir(SPILL_DIR)
    except OSError:
        pass


def _reap_dead():
    """Remove siblings whose owning process is gone — the 74 GB r14
    strand was exactly this debris class (a killed oracle run)."""
    if not os.path.isdir(SPILL_DIR):
        return
    for d in os.listdir(SPILL_DIR):
        if not d.startswith('pid'):
            # pre-r15 layout: loose duckdb_temp_storage-*.tmp files
            try:
                os.remove(os.path.join(SPILL_DIR, d))
            except OSError:
                pass
            continue
        pid = d[3:]
        if pid.isdigit() and not os.path.exists(f'/proc/{pid}'):
            shutil.rmtree(os.path.join(SPILL_DIR, d), ignore_errors=True)


def connect(mem_env='GRAFT_ORACLE_MEM', mem_default='48GB'):
    """Fresh DuckDB connection with capped, self-cleaning disk spill."""
    global _cleanup_registered
    _sweep_spill()  # own debris + dead siblings from crashed runs
    # retry: a concurrent tool's exit-sweep can rmdir the shared parent
    # between makedirs' two mkdir steps (observed once in a 4-way run)
    for attempt in range(5):
        try:
            os.makedirs(_my_spill(), exist_ok=True)
            break
        except FileNotFoundError:
            if attempt == 4:
                raise
    if not _cleanup_registered:
        atexit.register(_sweep_spill)
        _cleanup_registered = True
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{os.environ.get(mem_env, mem_default)}'")
    con.sql(f"SET temp_directory='{_my_spill()}'")
    cap = os.environ.get('GRAFT_SPILL_CAP', '40GB')
    con.sql(f"SET max_temp_directory_size='{cap}'")
    return con


def preflight(min_free_gb=20):
    """Fail fast (exit 3, stderr diagnosis) if the disk can't host a gate
    run; lists EVERY multi-GB resident (named suspects + the probe-debris
    globs janitor.py manages) and prints the cleanup command."""
    st = shutil.disk_usage('/tmp')
    free_gb = st.free / (1 << 30)
    if free_gb >= min_free_gb:
        return
    print(f"PRE-FLIGHT FAIL: only {free_gb:.1f} GB free on /tmp "
          f"(need {min_free_gb}). Likely culprits:", file=sys.stderr)
    # fixed suspects + every probe-corpus / verify-dump family under /tmp
    # (the same prefixes janitor.py sweeps), so a low-disk run names
    # every multi-GB resident instead of a hand-maintained subset
    suspects = [SPILL_DIR, '/root/repo/target']
    debris_prefixes = ('graft_sf', 'graft_skew', 'graft_test_', 'graft-',
                       'v10', 'v1f', 'vout', 'staged_', 'graft_pub_stage')
    try:
        for d in sorted(os.listdir('/tmp')):
            p = os.path.join('/tmp', d)
            if os.path.isdir(p) and p not in suspects and \
                    any(d.startswith(pre) for pre in debris_prefixes):
                suspects.append(p)
    except OSError:
        pass
    for d in suspects:
        if os.path.isdir(d):
            total = 0
            for root, _, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            if total >= (1 << 28) or d == SPILL_DIR:
                print(f"  {d}: {total / (1 << 30):.1f} GB", file=sys.stderr)
    print("  cleanup: python3 tools/janitor.py "
          "[--delete --keep <corpora-this-round-reads>]", file=sys.stderr)
    sys.exit(3)
