"""The driver's multi-chip dry-run contract at a mesh size the CI mesh
doesn't use: dryrun_multichip fixes tiny shapes per leg, and the standing
8-device runs can't catch divisibility assumptions that only break at other
mesh sizes (batch split, store row padding, fused group stacking). One
16-device case is cheap insurance (VERDICT r4 #7)."""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_dryrun_multichip_16():
    import os

    env = os.environ.copy()
    # dryrun_multichip sets the device-count flag itself; a stale 8-device
    # value from the test env would override the 16-case
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "multichip", "16"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    for leg in (
        "dryrun_multichip(16) ok on mesh dp=8 x tp=2",
        "one-epoch fused (K=2) shard_map train ok",
        "device-resident store fused train ok",
        "row-sharded device store fused train ok",
        "dp whole-scene eval ok",
    ):
        assert leg in proc.stdout, (leg, proc.stdout[-2000:], proc.stderr[-2000:])
