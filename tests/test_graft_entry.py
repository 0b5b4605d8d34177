"""Driver-facing entry points must work in a FRESH process without conftest.

Round-1 regression: ``dryrun_multichip`` passed under pytest (conftest forces the
CPU platform) but failed in the driver's process, where the axon TPU plugin stays
the default platform and the tiny-batch ``jnp.asarray`` device_put onto the real
TPU died on a libtpu flake (MULTICHIP_r01.json rc=1). The fix forces CPU inside
``dryrun_multichip`` itself; this test reproduces the driver environment exactly:
a clean subprocess, no pytest conftest, whatever platform sitecustomize installs.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_fresh_subprocess():
    env = os.environ.copy()
    # Simulate the driver: no explicit platform forcing beyond what the driver
    # itself sets; the entry point must not rely on pytest's conftest.
    env.pop("AMPNET_PLATFORM", None)
    env.pop("AMPNET_DRYRUN_REAL", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    assert "dryrun_multichip OK: 8 devices" in proc.stdout, proc.stdout
