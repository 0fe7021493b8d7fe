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


def _sweep_spill():
    shutil.rmtree(SPILL_DIR, ignore_errors=True)


def connect(mem_env='GRAFT_ORACLE_MEM', mem_default='48GB'):
    """Fresh DuckDB connection with capped, self-cleaning disk spill."""
    global _cleanup_registered
    _sweep_spill()  # debris from a crashed previous run
    os.makedirs(SPILL_DIR, exist_ok=True)
    if not _cleanup_registered:
        atexit.register(_sweep_spill)
        _cleanup_registered = True
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{os.environ.get(mem_env, mem_default)}'")
    con.sql(f"SET temp_directory='{SPILL_DIR}'")
    cap = os.environ.get('GRAFT_SPILL_CAP', '40GB')
    con.sql(f"SET max_temp_directory_size='{cap}'")
    return con


def preflight(min_free_gb=20):
    """Fail fast (exit 3, stderr diagnosis) if the disk can't host a gate
    run; lists the usual culprits so the operator knows what to clear."""
    st = shutil.disk_usage('/tmp')
    free_gb = st.free / (1 << 30)
    if free_gb >= min_free_gb:
        return
    print(f"PRE-FLIGHT FAIL: only {free_gb:.1f} GB free on /tmp "
          f"(need {min_free_gb}). Likely culprits:", file=sys.stderr)
    suspects = [SPILL_DIR, '/tmp/graft_sf10full', '/tmp/v10full',
                '/root/repo/target']
    for d in suspects:
        if os.path.isdir(d):
            total = 0
            for root, _, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            print(f"  {d}: {total / (1 << 30):.1f} GB", file=sys.stderr)
    sys.exit(3)
