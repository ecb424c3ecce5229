from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_postgres_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")

# Suite tiers (r18, VERDICT r17 item 2): the full suite grew past the
# external driver's verify window (42 min measured; the r17 driver run was
# cut off unfinished at ~72%), so long-running stress/fuzz depth and the
# in-suite duplicate of the driver's own 344-query oracle gate move to an
# opt-in SOAK tier. Default tier = every behavior still covered, at lower
# fuzz depth and with a representative oracle-parity slice; SPARK_GRAFT_SOAK=1
# restores the full sweep (use it for release-style local validation).
SOAK = os.environ.get("SPARK_GRAFT_SOAK", "") == "1"
soak_only = pytest.mark.skipif(
    not SOAK,
    reason="soak tier — set SPARK_GRAFT_SOAK=1 (long-running stress, or "
    "redundant with the driver's own full oracle gate; the default tier "
    "must finish inside the driver's verify window)",
)


def fuzz_cases(full: int, fast: int) -> int:
    """Iteration count for a deterministic fuzz loop: the SOAK tier runs
    the full count, the default tier a prefix of the SAME seeded stream
    (every case that runs is identical across tiers)."""
    return full if SOAK else fast


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


PG_BIN = "/usr/lib/postgresql/15/bin"
# per-process dir: two concurrent pytest sessions each boot their own
# server — a shared path let the second session's rmtree delete the
# first's running socket/datadir (r16: every [postgres] error in a
# concurrent run was this, not a product defect)
PG_DIR = f"/tmp/spark_graft_pg_test_{os.getpid()}"
PG_PORT = 5499


@pytest.fixture(scope="session")
def pg_url():
    """Boot a private PostgreSQL 15 instance (trust auth, unix socket only)
    once per session; the whole catalog matrix and the live-wire tests share
    it. Skips cleanly where the server binaries are unavailable."""
    import shutil
    import subprocess

    def _run(cmd):
        return subprocess.run(cmd, capture_output=True, text=True, timeout=60)

    if not os.path.exists(f"{PG_BIN}/initdb") or not shutil.which("runuser"):
        pytest.skip("no PostgreSQL server binaries in this environment")
    # sweep stale per-pid dirs from sessions killed before teardown: stop
    # their orphaned servers and reclaim /tmp (only dirs whose owning pid
    # is dead — a LIVE concurrent session's dir is untouched)
    import glob as _glob

    for stale in _glob.glob("/tmp/spark_graft_pg_test_*"):
        try:
            pid = int(stale.rsplit("_", 1)[-1])
            os.kill(pid, 0)
        except ValueError:
            continue
        except ProcessLookupError:
            _run(
                ["runuser", "-u", "postgres", "--", f"{PG_BIN}/pg_ctl",
                 "-D", f"{stale}/data", "-m", "immediate", "stop"]
            )
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            continue  # pid exists under another user: leave it alone
    shutil.rmtree(PG_DIR, ignore_errors=True)
    os.makedirs(PG_DIR, exist_ok=True)
    shutil.chown(PG_DIR, "postgres", "postgres")
    init = _run(
        ["runuser", "-u", "postgres", "--", f"{PG_BIN}/initdb",
         "-D", f"{PG_DIR}/data", "-A", "trust", "-U", "postgres"]
    )
    if init.returncode != 0:
        pytest.skip(f"initdb failed: {init.stderr[-200:]}")
    # Auth-matrix entries ahead of the default trust lines: the wire client's
    # md5 and SCRAM-SHA-256 negotiation paths are exercised against real
    # server-side auth (pg_hba first-match wins).
    hba = f"{PG_DIR}/data/pg_hba.conf"
    with open(hba) as f:
        default_hba = f.read()
    with open(hba, "w") as f:
        f.write(
            "local all scram_user scram-sha-256\n"
            "local all md5_user md5\n"
            "local all clear_user password\n" + default_hba
        )
    start = _run(
        ["runuser", "-u", "postgres", "--", f"{PG_BIN}/pg_ctl", "-D", f"{PG_DIR}/data",
         "-o", f"-c listen_addresses='' -c unix_socket_directories={PG_DIR} -c port={PG_PORT}",
         "-l", f"{PG_DIR}/log", "-w", "start"]
    )
    if start.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {start.stderr[-200:]}")
    try:
        yield f"postgres://postgres@localhost:{PG_PORT}/postgres?host={PG_DIR}"
    finally:
        _run(
            ["runuser", "-u", "postgres", "--", f"{PG_BIN}/pg_ctl",
             "-D", f"{PG_DIR}/data", "-m", "immediate", "stop"]
        )
        shutil.rmtree(PG_DIR, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
