"""Multi-host (multi-process) dryrun: 2 localhost CPU workers x 4 virtual
devices under jax.distributed run the band-sharded binocular train step over
the global 8-device mesh and must bit-match the single-process 8-device
mesh. The DCN analog of the single-host CPU-mesh parity tests — this is the
checked capability BASELINE.md's ">= 2 hosts" scaling row rests on.
(Subprocess-based: each worker pins JAX to CPU before first device use.)"""

import pytest

from binocular3dgs_tpu.parallel.multihost import dryrun_multihost


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    loss = dryrun_multihost(num_processes=2, local_devices=4, timeout=600)
    assert loss == loss  # finite (dryrun asserts parity internally)
