"""Conv primitives vs a torch-CPU oracle (torch used only as an independent
numerical oracle in tests — the framework itself is pure JAX)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from v2e2v_tpu.ops.conv import (
    bilinear_resize,
    conv2d,
    conv_init,
    conv_layer,
    conv_lstc_init,
    conv_lstc_step,
    conv_lstm_init,
    conv_lstm_step,
    conv_lstm_zero_state,
    torch_conv_to_hwio,
    upsample_conv_layer,
)


def _rand_torch_conv(in_ch, out_ch, k, seed=0):
    torch.manual_seed(seed)
    conv = torch.nn.Conv2d(in_ch, out_ch, k, padding=0, bias=True)
    params = {
        "weight": jnp.asarray(torch_conv_to_hwio(conv.weight.detach().numpy())),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    return conv, params


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 2)])
def test_conv2d_reflect_matches_torch(stride, padding):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 12, 3)).astype(np.float32)
    conv, params = _rand_torch_conv(3, 5, 3)

    got = np.asarray(conv2d(jnp.asarray(x), params, stride=stride, padding=padding))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    xt = F.pad(xt, (padding,) * 4, mode="reflect")
    want = conv(xt).detach().numpy()
    if stride > 1:
        # emulate strided conv: torch conv with stride
        conv2 = torch.nn.Conv2d(3, 5, 3, stride=stride, bias=True)
        conv2.weight.data = conv.weight.data
        conv2.bias.data = conv.bias.data
        want = conv2(xt).detach().numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bilinear_resize_align_false_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 7, 9, 2)).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), 14, 18, align_corners=False))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(xt, size=(14, 18), mode="bilinear", align_corners=False)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_resize_align_true_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 5, 3)).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), 12, 10, align_corners=True))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(xt, size=(12, 10), mode="bilinear", align_corners=True)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_conv_layer_matches_torch():
    """UpsampleConvLayer: bilinear 2x -> reflect pad 1 -> valid 3x3 conv -> relu
    (reference base_layers.py:166-210)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 6, 4)).astype(np.float32)
    conv, params = _rand_torch_conv(4, 4, 3)

    got = np.asarray(
        upsample_conv_layer(jnp.asarray(x), params, kernel_size=3, activation="relu")
    )

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    up = F.interpolate(xt, size=(10, 12), mode="bilinear", align_corners=False)
    up = F.pad(up, (1, 1, 1, 1), mode="reflect")
    want = torch.relu(conv(up)).detach().numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_lstm_step_matches_reference_equations():
    """ConvLSTM (base_layers.py:75-130): gates conv on cat(x, h); chunks
    (in, remember, out, cell); cell = rem*prev + in*tanh(cell_g);
    hidden = out*tanh(cell)."""
    rng = np.random.default_rng(4)
    b, h, w, cin, ch = 2, 6, 7, 3, 4
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    hprev = rng.normal(size=(b, h, w, ch)).astype(np.float32)
    cprev = rng.normal(size=(b, h, w, ch)).astype(np.float32)

    conv, gate_params = _rand_torch_conv(cin + ch, 4 * ch, 3)
    params = {"Gates": gate_params}

    hid, (hid2, cell) = conv_lstm_step(params, jnp.asarray(x), (jnp.asarray(hprev), jnp.asarray(cprev)))

    xt = torch.from_numpy(np.transpose(np.concatenate([x, hprev], -1), (0, 3, 1, 2)))
    xt = F.pad(xt, (1, 1, 1, 1), mode="reflect")
    gates = conv(xt)
    in_g, rem_g, out_g, cell_g = gates.chunk(4, 1)
    cell_t = torch.sigmoid(rem_g) * torch.from_numpy(
        np.transpose(cprev, (0, 3, 1, 2))
    ) + torch.sigmoid(in_g) * torch.tanh(cell_g)
    hidden_t = torch.sigmoid(out_g) * torch.tanh(cell_t)

    np.testing.assert_allclose(
        np.asarray(hid), np.transpose(hidden_t.detach().numpy(), (0, 2, 3, 1)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(cell), np.transpose(cell_t.detach().numpy(), (0, 2, 3, 1)), atol=2e-5
    )
    assert np.shares_memory(np.asarray(hid), np.asarray(hid2)) or np.array_equal(
        np.asarray(hid), np.asarray(hid2)
    )


def test_conv_lstc_step_matches_reference_equations():
    """ConvLSTC (base_layers.py:38-71)."""
    rng = np.random.default_rng(5)
    b, h, w = 1, 5, 5
    x_size, z_size, out_size = 3, 6, 6
    x = rng.normal(size=(b, h, w, x_size)).astype(np.float32)
    z = rng.normal(size=(b, h, w, z_size)).astype(np.float32)
    prev = rng.normal(size=(b, h, w, out_size)).astype(np.float32)

    gates_c, gates_p = _rand_torch_conv(x_size + z_size, 2 * out_size, 3, seed=10)
    outg_c, outg_p = _rand_torch_conv(z_size + out_size, out_size, 3, seed=11)
    p0_c, p0_p = _rand_torch_conv(x_size, out_size, 3, seed=12)
    params = {"gates": gates_p, "out_gates": outg_p, "P0": p0_p}

    out, cell = conv_lstc_step(params, jnp.asarray(x), jnp.asarray(z), jnp.asarray(prev))

    def tconv(conv, arr):
        at = torch.from_numpy(np.transpose(arr, (0, 3, 1, 2)))
        at = F.pad(at, (1, 1, 1, 1), mode="reflect")
        return conv(at)

    gates = tconv(gates_c, np.concatenate([x, z], -1))
    in_g, f_g = gates.chunk(2, 1)
    z0 = tconv(p0_c, x)
    out_g = torch.sigmoid(tconv(outg_c, np.concatenate(
        [np.transpose(z0.detach().numpy(), (0, 2, 3, 1)), z], -1)))
    cell_t = torch.sigmoid(f_g) * torch.from_numpy(np.transpose(prev, (0, 3, 1, 2))) + torch.sigmoid(in_g) * z0
    out_t = out_g * torch.tanh(cell_t)

    np.testing.assert_allclose(
        np.asarray(out), np.transpose(out_t.detach().numpy(), (0, 2, 3, 1)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(cell), np.transpose(cell_t.detach().numpy(), (0, 2, 3, 1)), atol=2e-5
    )


def test_conv_init_shapes_and_bounds():
    key = jax.random.PRNGKey(0)
    p = conv_init(key, 8, 16, 3)
    assert p["weight"].shape == (3, 3, 8, 16)
    assert p["bias"].shape == (16,)
    bound = 1.0 / np.sqrt(8 * 9)
    assert np.abs(np.asarray(p["weight"])).max() <= bound
    assert np.abs(np.asarray(p["bias"])).max() <= bound


class TestReflectFastPath:
    """The pad-copy-free 3x3 reflect conv (``_reflect1_conv3x3``) must be
    EXACT vs the pad-op path: zero padding folded into the conv HLO plus one
    grouped strip conv for the border ring (see ops/conv.py)."""

    def _compare(self, h, w, cin=16, cout=8, seed=0):
        from v2e2v_tpu.ops import conv as conv_mod

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        params = {
            "weight": jnp.asarray(
                rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
            ),
            "bias": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
        }
        # the suite conftest pins REFLECT_FAST_PATH=False globally (CPU
        # trace/compile cost); force each leg explicitly and restore
        saved = conv_mod.REFLECT_FAST_PATH
        try:
            conv_mod.REFLECT_FAST_PATH = True
            y_fast = conv2d(x, params, padding=1)
            g_fast = jax.grad(lambda v: (conv2d(v, params, padding=1) ** 2).sum())(x)
            conv_mod.REFLECT_FAST_PATH = False
            y_ref = conv2d(x, params, padding=1)
            g_ref = jax.grad(lambda v: (conv2d(v, params, padding=1) ** 2).sum())(x)
        finally:
            conv_mod.REFLECT_FAST_PATH = saved
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref), atol=2e-5)
        scale = max(1.0, float(jnp.max(jnp.abs(g_ref))))
        np.testing.assert_allclose(
            np.asarray(g_fast) / scale, np.asarray(g_ref) / scale, atol=2e-5
        )

    def test_even_dims(self):
        self._compare(18, 24)

    def test_odd_dims(self):
        self._compare(17, 21)

    def test_tall_narrow(self):
        self._compare(32, 16)

    def test_vs_torch_oracle(self):
        # independent oracle at a fast-path-eligible size; force the fast
        # path (the suite conftest disables the default routing)
        from v2e2v_tpu.ops import conv as conv_mod

        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 20, 18, 3)).astype(np.float32)
        conv, params = _rand_torch_conv(3, 5, 3, seed=7)
        saved = conv_mod.REFLECT_FAST_PATH
        try:
            conv_mod.REFLECT_FAST_PATH = True
            got = np.asarray(conv2d(jnp.asarray(x), params, padding=1))
        finally:
            conv_mod.REFLECT_FAST_PATH = saved
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = conv(F.pad(xt, (1, 1, 1, 1), mode="reflect")).detach().numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=2e-5)


def test_conv_lstc_fused_matches_ref_and_grads():
    """The opt-in 2-conv ConvLSTC rewrite (conv_lstc_fuse) is exact vs the
    3-conv cell, including gradients back to the stored conv params."""
    from v2e2v_tpu.ops.conv import (
        conv_lstc_fuse,
        conv_lstc_init,
        conv_lstc_step,
        conv_lstc_step_fused,
    )

    p = conv_lstc_init(jax.random.PRNGKey(0), x_size=8, z_size=16, output_size=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 18, 20, 8))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 18, 20, 16))
    c = jax.random.normal(jax.random.PRNGKey(3), (2, 18, 20, 16))

    o1, c1 = conv_lstc_step(p, x, z, c)
    o2, c2 = conv_lstc_step_fused(conv_lstc_fuse(p), x, z, c)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-6)

    g1 = jax.grad(lambda p: conv_lstc_step(p, x, z, c)[0].sum())(p)
    g2 = jax.grad(
        lambda p: conv_lstc_step_fused(conv_lstc_fuse(p), x, z, c)[0].sum()
    )(p)
    for k in g1:
        for kk in g1[k]:
            np.testing.assert_allclose(
                np.asarray(g1[k][kk]), np.asarray(g2[k][kk]), atol=1e-4,
                err_msg=f"{k}.{kk}",
            )
