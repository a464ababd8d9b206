"""Two-process multi-host smoke (VERDICT r4 item 5).

Executes the ``jax.process_count() > 1`` branch of global-batch assembly
(``jax.make_array_from_process_local_data`` via parallel.mesh.put_global)
for real: two local processes jax.distributed.initialize over localhost
(CPU backend, 4 fake devices each) and run one DP train step; the loss
must equal the 1-process 8-device result on the identical global batch.

Costs several minutes of subprocess compiles on a 1-core host, so it is
opt-in: ``VTACO_MULTIHOST_TEST=1 pytest tests/test_multihost_smoke.py``.
The driver-side ``python __graft_entry__.py multihost 2`` runs the same
smoke (its result is recorded in the dryrun tail).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("VTACO_MULTIHOST_TEST") != "1",
    reason="multi-process smoke is opt-in (VTACO_MULTIHOST_TEST=1): "
    "several minutes of subprocess compiles",
)


def test_two_process_dp_step_matches_single_process():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "__graft_entry__.py"),
         "multihost", "2"],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "dryrun_multihost ok" in out.stdout, out.stdout[-2000:]
