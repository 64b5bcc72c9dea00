"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import os
import sys

import jax
import jax.numpy as jnp
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


@pytest.mark.parametrize("w", [16, 24, 40])
def test_spatial_sharding_matches_single_device(w):
    """A (2, 2) data x spatial mesh must reproduce the single-device loss,
    updated params, AND gradients to fp32 tolerance — spatial sharding of W
    makes XLA insert halo exchanges for the reflect-padded 3x3 convs, which
    is exactly where silent wrongness would live. Widths chosen so per-shard
    half-res width is even (16 -> 4), odd (24 -> 6... 3 at quarter? no: 24/2
    = 12 half-res, 6/shard), and non-power-of-two (40 -> 20 half-res,
    10/shard)."""
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    cfg = CistaConfig(image_dim=(16, w), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)

    key = jax.random.PRNGKey(2)
    voxel_seq = jax.random.normal(key, (3, 2, 16, w, 5))
    gt = jax.random.uniform(jax.random.fold_in(key, 1), (2, 16, w, 1))

    results = {}
    for n_data, n_spatial in ((1, 1), (2, 2)):
        mesh = make_mesh(n_data, n_spatial, devices=jax.devices()[: n_data * n_spatial])
        step = make_e2v_train_step(cfg, tx, mesh)
        p, o, loss = step(
            jax.tree_util.tree_map(lambda x: x.copy(), params),
            tx.init(params), voxel_seq, gt,
        )
        results[(n_data, n_spatial)] = (float(loss), p)

    loss_1, p_1 = results[(1, 1)]
    loss_s, p_s = results[(2, 2)]
    assert loss_1 == pytest.approx(loss_s, rel=1e-5)
    # every parameter leaf (i.e. every gradient) must match
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        ),
        p_1, p_s,
    )


def test_spatial_sharding_grads_match(w=24):
    """Direct gradient comparison (pre-optimizer) on the spatial mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from v2e2v_tpu.models.cista import CistaConfig, cista_sequence, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import make_mesh, replicated

    cfg = CistaConfig(image_dim=(16, w), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(3)
    voxel_seq = jax.random.normal(key, (2, 2, 16, w, 5))
    gt = jax.random.uniform(jax.random.fold_in(key, 1), (2, 16, w, 1))

    def loss_fn(p, seq, gt):
        recs, _ = cista_sequence(p, cfg, seq)
        return ((recs[-1] - gt) ** 2).mean()

    g_single = jax.grad(loss_fn)(params, voxel_seq, gt)

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    shard = NamedSharding(mesh, P(None, "data", None, "spatial", None))
    gt_shard = NamedSharding(mesh, P("data", None, "spatial", None))
    g_fn = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(replicated(mesh), shard, gt_shard),
        out_shardings=replicated(mesh),
    )
    g_sharded = g_fn(params, voxel_seq, gt)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        ),
        g_single, g_sharded,
    )


def test_device_data_step_matches_host_batch_step():
    """The device-resident-dataset step (on-device gather by index) must
    produce the same loss/params as the host-batch step on the same batch."""
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.parallel.mesh import (
        make_e2v_train_step,
        make_e2v_train_step_device_data,
        make_mesh,
    )

    cfg = CistaConfig(image_dim=(16, 20), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    mesh = make_mesh(1, 1)

    key = jax.random.PRNGKey(9)
    data = jax.random.normal(key, (6, 3, 16, 20, 5))  # [N, T, H, W, nb]
    gt_all = jax.random.uniform(jax.random.fold_in(key, 1), (6, 16, 20, 1))
    idx = jnp.asarray([4, 1], jnp.int32)

    host_step = make_e2v_train_step(cfg, tx, mesh)
    dev_step = make_e2v_train_step_device_data(cfg, tx, mesh)

    voxel_seq = jnp.moveaxis(data[idx], 1, 0)  # [T, B, H, W, nb]
    gt = gt_all[idx]
    p1, _, loss1 = host_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        tx.init(params), voxel_seq, gt,
    )
    p2, _, loss2 = dev_step(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        tx.init(params), data, gt_all, idx, jax.random.PRNGKey(0),
    )
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6
        ),
        p1, p2,
    )


def test_spatial_sharding_matches_with_reflect_fast_path():
    """Same equality at a resolution where the pad-copy-free reflect conv
    (ops/conv.py REFLECT_FAST_PATH, active at >=16x16) is engaged: its
    border corrections use global-iota `where` masks and strip slices that
    must keep GLOBAL semantics under GSPMD spatial partitioning."""
    import optax

    from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
    from v2e2v_tpu.ops import conv as conv_mod
    from v2e2v_tpu.parallel.mesh import make_e2v_train_step, make_mesh

    assert conv_mod.REFLECT_FAST_PATH
    cfg = CistaConfig(image_dim=(64, 80), base_channels=8, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)

    key = jax.random.PRNGKey(4)
    voxel_seq = jax.random.normal(key, (2, 2, 64, 80, 5))
    gt = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 80, 1))

    results = {}
    for n_data, n_spatial in ((1, 1), (2, 4)):
        mesh = make_mesh(n_data, n_spatial, devices=jax.devices()[: n_data * n_spatial])
        step = make_e2v_train_step(cfg, tx, mesh)
        p, o, loss = step(
            jax.tree_util.tree_map(lambda x: x.copy(), params),
            tx.init(params), voxel_seq, gt,
        )
        results[(n_data, n_spatial)] = (float(loss), p)

    loss_1, p_1 = results[(1, 1)]
    loss_s, p_s = results[(2, 4)]
    assert loss_1 == pytest.approx(loss_s, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        ),
        p_1, p_s,
    )
