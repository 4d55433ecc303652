"""Regression tests for the driver entry points (``__graft_entry__.py``).

Round 1's multichip verification failed because ``dryrun_multichip`` relied
on the caller's env to provide 8 devices (MULTICHIP_r01.json: ``need 8
devices, have 1`` — the axon sitecustomize latches the TPU platform in any
process). The function must force the virtual CPU mesh itself; these tests
pin that behavior.
"""

import os
import subprocess
import sys


def test_dryrun_multichip_in_process():
    # conftest already forces an 8-device CPU mesh; dryrun must be a no-op
    # re-force and succeed.
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_fresh_process_no_env_help():
    """Driver-style invocation: fresh process, no XLA_FLAGS/JAX_PLATFORMS help."""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
    # the dp x tp GSPMD step must run too (parallel/tp.py shardings)
    assert "dp4 x tp2 ok" in proc.stdout
