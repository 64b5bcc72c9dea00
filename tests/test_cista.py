"""CISTA nets vs an independent torch-CPU oracle built from the architecture
spec (reference e2v/e2v_model.py behavior), plus state-threading invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from v2e2v_tpu.models.cista import (
    CistaConfig,
    cista_lstc_step,
    cista_sequence,
    cista_tc_step,
    cista_zero_state,
    init_cista_lstc,
    init_cista_tc,
)

H, W, C, NB, DEPTH = 16, 20, 8, 5, 3


def _w(p):  # HWIO -> torch OIHW
    return torch.from_numpy(np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1)))


def _b(p):
    return torch.from_numpy(np.asarray(p["bias"]))


def _conv(x, p, stride=1, padding=1, act=None):
    x = F.pad(x, (padding,) * 4, mode="reflect") if padding else x
    y = F.conv2d(x, _w(p), _b(p), stride=stride)
    if act == "relu":
        y = torch.relu(y)
    return y


def _torch_lstc_oracle(params, cfg, events, prev_img, state):
    """Reference CistaLSTCNet.forward math (e2v_model.py:41-90) in torch."""
    cell, z_prev, (dg_h, dg_c) = state
    x_e = _conv(events, params["We"])
    x_i = _conv(prev_img, params["Wi"])
    x1 = _conv(torch.cat([x_e, x_i], 1), params["W0"], stride=2)

    # ConvLSTC (base_layers.py:52-71)
    p0 = params["P0"]
    gates = _conv(torch.cat([x1, z_prev], 1), p0["gates"])
    in_g, f_g = gates.chunk(2, 1)
    z0 = _conv(x1, p0["P0"])
    out_g = torch.sigmoid(_conv(torch.cat([z0, z_prev], 1), p0["out_gates"]))
    cell = torch.sigmoid(f_g) * cell + torch.sigmoid(in_g) * z0
    z = out_g * torch.tanh(cell)

    lam = torch.from_numpy(np.asarray(params["lista"]["Lambda"])).view(1, -1, 1, 1)
    tmp = z
    for _ in range(cfg.depth):
        tmp = _conv(tmp, params["lista"]["D"])
        x = _conv(x1 - tmp, params["lista"]["P"]) + z
        z = torch.relu(x - lam) - torch.relu(-x - lam)
        tmp = z

    x = _conv(z, params["Dg"]["conv"], act="relu")
    g = _conv(torch.cat([x, dg_h], 1), params["Dg"]["lstm"]["Gates"])
    i_g, r_g, o_g, c_g = g.chunk(4, 1)
    dg_c = torch.sigmoid(r_g) * dg_c + torch.sigmoid(i_g) * torch.tanh(c_g)
    dg_h = torch.sigmoid(o_g) * torch.tanh(dg_c)

    up = F.interpolate(dg_h, size=cfg.image_dim, mode="bilinear", align_corners=False)
    rec = _conv(up, params["upsamp_conv"], act="relu")
    rec = _conv(rec, params["final_conv"])
    return torch.sigmoid(rec), (cell, z, (dg_h, dg_c))


def _nhwc(t):
    return jnp.asarray(np.transpose(t.numpy(), (0, 2, 3, 1)))


def _nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def test_cista_lstc_matches_torch_oracle_two_steps():
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=DEPTH, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)

    torch.manual_seed(0)
    events1 = torch.randn(2, NB, H, W)
    events2 = torch.randn(2, NB, H, W)
    prev = torch.zeros(2, 1, H, W)

    zeros2 = torch.zeros(2, 2 * C, H // 2, W // 2)
    zeros1 = torch.zeros(2, C, H // 2, W // 2)
    t_state = (zeros2, zeros2, (zeros1, zeros1))
    t_rec1, t_state = _torch_lstc_oracle(params, cfg, events1, prev, t_state)
    t_rec2, t_state = _torch_lstc_oracle(params, cfg, events2, t_rec1, t_state)

    j_state = cista_zero_state(cfg, 2)
    j_rec1, j_state = cista_lstc_step(params, cfg, _nhwc(events1), _nhwc(prev), j_state)
    j_rec2, j_state = cista_lstc_step(params, cfg, _nhwc(events2), j_rec1, j_state)

    np.testing.assert_allclose(_nchw(j_rec1), t_rec1.numpy(), atol=3e-5)
    np.testing.assert_allclose(_nchw(j_rec2), t_rec2.numpy(), atol=3e-5)
    np.testing.assert_allclose(_nchw(j_state.z), t_state[1].numpy(), atol=3e-5)


def test_cista_sequence_equals_manual_loop():
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(1), cfg)
    seq = jax.random.normal(jax.random.PRNGKey(2), (4, 1, H, W, NB))

    recs, final_state = cista_sequence(params, cfg, seq)

    state = cista_zero_state(cfg, 1)
    prev = jnp.zeros((1, H, W, 1))
    for i in range(4):
        rec, state = cista_lstc_step(params, cfg, seq[i], prev, state)
        np.testing.assert_allclose(np.asarray(recs[i]), np.asarray(rec), atol=1e-6)
        prev = rec
    np.testing.assert_allclose(np.asarray(final_state.z), np.asarray(state.z), atol=1e-6)


def test_cista_sequence_remat_matches_values_and_grads():
    """``remat=True`` (jax.checkpoint on the scan body) must not change the
    forward values or the BPTT gradients — only the backward-pass memory."""
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(1), cfg)
    seq = jax.random.normal(jax.random.PRNGKey(3), (3, 2, H, W, NB))
    gt = jax.random.uniform(jax.random.PRNGKey(4), (2, H, W, 1))

    def loss(params, remat):
        recs, _ = cista_sequence(params, cfg, seq, remat=remat)
        return jnp.mean((recs[-1] - gt) ** 2)

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        ),
        g0, g1,
    )


def test_cista_tc_runs_and_uses_temporal_state():
    cfg = CistaConfig(
        image_dim=(H, W), base_channels=C, depth=2, num_bins=NB, model_mode="cista-tc"
    )
    params = init_cista_tc(jax.random.PRNGKey(3), cfg)
    # alpha initializes ~U[0, 0.001); boost it so the temporal path is visible
    params["alpha"] = jnp.ones_like(params["alpha"])
    events = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, NB))
    prev_img = jnp.zeros((1, H, W, 1))

    s0 = cista_zero_state(cfg, 1)
    rec_a, st_a = cista_tc_step(params, cfg, events, prev_img, s0)
    assert rec_a.shape == (1, H, W, 1)
    assert np.all(np.asarray(rec_a) >= 0) and np.all(np.asarray(rec_a) <= 1)

    # a different previous code must change the output (temporal path alive)
    s1 = s0._replace(z=jnp.ones_like(s0.z))
    rec_b, _ = cista_tc_step(params, cfg, events, prev_img, s1)
    assert not np.allclose(np.asarray(rec_a), np.asarray(rec_b))


def test_cista_lstc_jit_and_grad():
    cfg = CistaConfig(image_dim=(H, W), base_channels=C, depth=2, num_bins=NB)
    params = init_cista_lstc(jax.random.PRNGKey(5), cfg)
    seq = jax.random.normal(jax.random.PRNGKey(6), (3, 1, H, W, NB))
    gt = jax.random.uniform(jax.random.PRNGKey(7), (1, H, W, 1))

    @jax.jit
    def loss_fn(p):
        recs, _ = cista_sequence(p, cfg, seq)
        return jnp.mean((recs[-1] - gt) ** 2)  # many-to-one loss

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # gradient reaches the earliest layers through the recurrence
    assert float(jnp.abs(g["We"]["weight"]).max()) > 0


def _torch_tc_oracle(params, cfg, events, prev_img, state):
    """Reference CistaTCNet.forward math (e2v_model.py:146-197) in torch."""
    _, z_prev, (dg_h, dg_c) = state
    x_e = _conv(events, params["We"])
    x_i = _conv(prev_img, params["Wi"])
    x1 = _conv(torch.cat([x_e, x_i], 1), params["W0"], stride=2)
    z = _conv(x1, params["P0"])
    tmp = z

    one_prev = _conv(z_prev, params["one_conv_for_prev"])
    lam = torch.from_numpy(np.asarray(params["lista"]["Lambda"])).view(1, -1, 1, 1)
    alpha = torch.from_numpy(np.asarray(params["alpha"])).view(1, -1, 1, 1)
    for _ in range(cfg.depth):
        one_cur = _conv(tmp, params["one_conv_for_cur"])
        attention = torch.sigmoid(one_prev * one_cur)
        temporal_z = attention * ((z_prev - tmp) * alpha)
        tmp = _conv(tmp, params["lista"]["D"])
        x = _conv(x1 - tmp, params["lista"]["P"]) + z + temporal_z
        z = torch.relu(x - lam) - torch.relu(-x - lam)
        tmp = z

    x = _conv(z, params["Dg"]["conv"], act="relu")
    g = _conv(torch.cat([x, dg_h], 1), params["Dg"]["lstm"]["Gates"])
    i_g, r_g, o_g, c_g = g.chunk(4, 1)
    dg_c = torch.sigmoid(r_g) * dg_c + torch.sigmoid(i_g) * torch.tanh(c_g)
    dg_h = torch.sigmoid(o_g) * torch.tanh(dg_c)

    up = F.interpolate(dg_h, size=cfg.image_dim, mode="bilinear", align_corners=False)
    rec = _conv(up, params["upsamp_conv"])  # TC: no activation (:127)
    rec = _conv(rec, params["final_conv"])
    return torch.sigmoid(rec), (None, z, (dg_h, dg_c))


def test_cista_tc_matches_torch_oracle_two_steps():
    from v2e2v_tpu.models.cista import init_cista_tc

    cfg = CistaConfig(
        image_dim=(H, W), base_channels=C, depth=DEPTH, num_bins=NB,
        model_mode="cista-tc",
    )
    params = init_cista_tc(jax.random.PRNGKey(10), cfg)
    params["alpha"] = jnp.asarray(
        np.random.default_rng(0).uniform(0.2, 1.0, (2 * C,)).astype(np.float32)
    )

    torch.manual_seed(1)
    events1 = torch.randn(1, NB, H, W)
    events2 = torch.randn(1, NB, H, W)
    prev = torch.zeros(1, 1, H, W)

    zeros2 = torch.zeros(1, 2 * C, H // 2, W // 2)
    zeros1 = torch.zeros(1, C, H // 2, W // 2)
    t_state = (None, zeros2, (zeros1, zeros1))
    t_rec1, t_state = _torch_tc_oracle(params, cfg, events1, prev, t_state)
    t_rec2, t_state = _torch_tc_oracle(params, cfg, events2, t_rec1, t_state)

    j_state = cista_zero_state(cfg, 1)
    j_rec1, j_state = cista_tc_step(params, cfg, _nhwc(events1), _nhwc(prev), j_state)
    j_rec2, j_state = cista_tc_step(params, cfg, _nhwc(events2), j_rec1, j_state)

    np.testing.assert_allclose(_nchw(j_rec1), t_rec1.numpy(), atol=3e-5)
    np.testing.assert_allclose(_nchw(j_rec2), t_rec2.numpy(), atol=3e-5)
    np.testing.assert_allclose(_nchw(j_state.z), t_state[1].numpy(), atol=3e-5)
