"""Multi-chip data parallelism on the virtual 8-device CPU mesh.

Mirrors what the driver's dryrun validates, as a regression test: the full
training step (forward + grads + optimizer) must compile and execute with
the batch sharded over the mesh and parameters replicated.
"""
import numpy as np
import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs a multi-device mesh')
def test_dryrun_multichip_executes():
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(4)  # asserts finite loss + device placement internally


def test_shard_and_replicate_placement():
    from garment_pattern_estimation_tpu.parallel import (
        make_mesh, shard_batch, replicate, pad_batch_to_multiple)

    n = min(len(jax.devices()), 4)
    mesh = make_mesh(n)
    batch = {'features': np.arange(n * 2 * 6, dtype=np.float32).reshape(n * 2, 6)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded['features'].devices()) == n
    # values survive sharding
    np.testing.assert_array_equal(np.asarray(sharded['features']),
                                  batch['features'])

    params = {'w': np.ones((3, 3), np.float32)}
    replicated = replicate(mesh, params)
    assert len(replicated['w'].devices()) == n

    padded, real = pad_batch_to_multiple({'x': np.ones((5, 2))}, 4)
    assert padded['x'].shape[0] == 8 and real == 5
