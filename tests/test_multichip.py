"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_dryrun_multichip_both_steps():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # e2v (4x2 data x spatial) + v2e2v (8-way dp)


def test_data_parallel_matches_single_device():
    """The sharded E2V train step must produce the same loss/params as the
    unsharded one (pure data parallelism is numerics-preserving up to
    reduction order)."""
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    cfg = CistaConfig(image_dim=(16, 16), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)

    key = jax.random.PRNGKey(1)
    voxel_seq = jax.random.normal(key, (3, 8, 16, 16, 5))
    gt = jax.random.uniform(jax.random.fold_in(key, 1), (8, 16, 16, 1))

    results = {}
    for n_data in (1, 8):
        mesh = make_mesh(n_data, 1, devices=jax.devices()[:n_data])
        step = make_e2v_train_step(cfg, tx, mesh)
        p, o, loss = step(
            jax.tree_util.tree_map(lambda x: x.copy(), params),
            tx.init(params), voxel_seq, gt,
        )
        results[n_data] = (float(loss), np.asarray(p["We"]["weight"]))

    assert results[1][0] == pytest.approx(results[8][0], rel=1e-5)
    np.testing.assert_allclose(results[1][1], results[8][1], atol=1e-6)
