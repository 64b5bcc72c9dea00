"""Exactness of the fused full-resolution conv rewrites (ops/fused.py)
against the reference-faithful two-stage / upsample / conv paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
from v2e2v_tpu.ops.conv import conv_layer, upsample_conv_layer
from v2e2v_tpu.ops.fused import (
    depth_to_space,
    final_conv_parity,
    heads_fused,
    space_to_depth,
    upsample_conv_parity,
)


def _heads_ref(params, events, prev_image):
    x_e = conv_layer(events, params["We"], padding=1)
    x_i = conv_layer(prev_image, params["Wi"], padding=1)
    x1 = jnp.concatenate([x_e, x_i], axis=-1)
    return conv_layer(x1, params["W0"], stride=2, padding=1)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 12, 3), np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


@pytest.mark.parametrize("hw", [(12, 16), (20, 28), (90, 120)])
def test_heads_fused_exact(hw):
    h, w = hw
    cfg = CistaConfig(image_dim=(h, w), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ev = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    pi = jnp.asarray(rng.random((2, h, w, 1)).astype(np.float32))

    ref = _heads_ref(params, ev, pi)
    got = heads_fused(params, ev, pi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(6, 8), (10, 14), (45, 60)])
@pytest.mark.parametrize("activation", [None, "relu"])
def test_upsample_conv_parity_exact(hw, activation):
    h, w = hw
    c = 16
    key = jax.random.PRNGKey(2)
    from v2e2v_tpu.ops.conv import conv_init

    params = conv_init(key, c, c, 3)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, h, w, c)).astype(np.float32)
    )

    ref = upsample_conv_layer(x, params, activation=activation, out_hw=(2 * h, 2 * w))
    got = depth_to_space(upsample_conv_parity(params, x, activation=activation))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(6, 8), (12, 20), (90, 120)])
def test_final_conv_parity_exact(hw):
    h, w = hw
    c = 16
    from v2e2v_tpu.ops.conv import conv_init

    params = conv_init(jax.random.PRNGKey(4), c, 1, 3)
    full = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 2 * h, 2 * w, c)).astype(np.float32)
    )

    ref = conv_layer(full, params, padding=1)
    got = final_conv_parity(params, space_to_depth(full))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_decoder_chain_grads_match():
    """upsample+final consumed in the parity domain: values AND grads match
    the reference-faithful chain (the fused path is used in training)."""
    from v2e2v_tpu.ops.conv import conv_init

    h, w, c = 10, 12, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    p_up = conv_init(k1, c, c, 3)
    p_fin = conv_init(k2, c, 1, 3)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, h, w, c)).astype(np.float32)
    )

    def ref_chain(p_up, p_fin, x):
        y = upsample_conv_layer(x, p_up, activation="relu", out_hw=(2 * h, 2 * w))
        y = conv_layer(y, p_fin, padding=1)
        return jnp.sum(jax.nn.sigmoid(y) ** 2)

    def fused_chain(p_up, p_fin, x):
        y = upsample_conv_parity(p_up, x, activation="relu")
        y = final_conv_parity(p_fin, y)
        return jnp.sum(jax.nn.sigmoid(y) ** 2)

    v_ref, g_ref = jax.value_and_grad(ref_chain, argnums=(0, 1))(p_up, p_fin, x)
    v_fus, g_fus = jax.value_and_grad(fused_chain, argnums=(0, 1))(p_up, p_fin, x)
    assert float(v_ref) == pytest.approx(float(v_fus), rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        ),
        g_ref, g_fus,
    )


# ---------------------------------------------------------------------------
# round 3: analytic border kernels vs the strip-based fixup paths (which the
# tests above pin against the reference-faithful ops)
# ---------------------------------------------------------------------------

from v2e2v_tpu.ops.fused import (  # noqa: E402
    final_conv_parity_edgek,
    heads_fused_edgek,
    precompute_fused_kernels,
    upsample_conv_parity_edgek,
)


@pytest.mark.parametrize("hw", [(12, 16), (20, 28), (90, 120)])
def test_upsample_parity_edgek_exact(hw):
    h, w = hw
    params = {
        "weight": jnp.asarray(
            np.random.default_rng(2).normal(size=(3, 3, 8, 8)).astype(np.float32)
        )
        * 0.2,
        "bias": jnp.asarray(
            np.random.default_rng(3).normal(size=(8,)).astype(np.float32)
        ),
    }
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, h, w, 8)).astype(np.float32)
    )
    ref = upsample_conv_parity(params, x, activation="relu")
    got = upsample_conv_parity_edgek(params, x, activation="relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("hw", [(6, 8), (45, 60)])
def test_final_parity_edgek_exact(hw):
    h, w = hw
    params = {
        "weight": jnp.asarray(
            np.random.default_rng(5).normal(size=(3, 3, 8, 1)).astype(np.float32)
        )
        * 0.2,
        "bias": jnp.asarray(
            np.random.default_rng(6).normal(size=(1,)).astype(np.float32)
        ),
    }
    y = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, h, w, 32)).astype(np.float32)
    )
    ref = final_conv_parity(params, y)
    got = final_conv_parity_edgek(params, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("hw", [(12, 16), (90, 120)])
def test_heads_edgek_exact(hw):
    h, w = hw
    cfg = CistaConfig(image_dim=(h, w), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(8)
    ev = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, h, w, 1)).astype(np.float32))
    ref = _heads_ref(params, ev, img)
    got = heads_fused_edgek(params, ev, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_edgek_with_precomputed_kernels():
    cfg = CistaConfig(image_dim=(20, 24), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(1), cfg)
    kernels = precompute_fused_kernels(params)
    rng = np.random.default_rng(9)
    ev = jnp.asarray(rng.normal(size=(1, 20, 24, 5)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(1, 20, 24, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(heads_fused_edgek(params, ev, img, kernels=kernels)),
        np.asarray(_heads_ref(params, ev, img)),
        atol=2e-5,
    )
    h = jnp.asarray(rng.normal(size=(1, 10, 12, 16)).astype(np.float32))
    ref = final_conv_parity(
        params["final_conv"],
        upsample_conv_parity(params["upsamp_conv"], h, activation="relu"),
    )
    got = final_conv_parity_edgek(
        params["final_conv"],
        upsample_conv_parity_edgek(
            params["upsamp_conv"], h, activation="relu", kernels=kernels
        ),
        kernels=kernels,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# parity-domain IO (CistaConfig.io_layout='parity')
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("hw", [(12, 16), (90, 120)])
def test_heads_parity_edgek_exact(hw):
    from v2e2v_tpu.ops.fused import heads_parity_edgek

    h, w = hw
    cfg = CistaConfig(image_dim=(h, w), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    ev = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, h, w, 1)).astype(np.float32))
    ref = _heads_ref(params, ev, img)
    got = heads_parity_edgek(params, space_to_depth(ev), space_to_depth(img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_final_conv_parity_edgek_packed():
    from v2e2v_tpu.ops.fused import final_conv_parity_edgek

    cfg = CistaConfig(image_dim=(20, 24), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(12)
    y = jnp.asarray(rng.normal(size=(2, 10, 12, 64)).astype(np.float32))
    full = final_conv_parity_edgek(params["final_conv"], y)
    packed = final_conv_parity_edgek(params["final_conv"], y, packed=True)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(packed)), np.asarray(full)
    )


def test_cista_sequence_parity_io_matches_full():
    """io_layout='parity' equals the default path in values AND BPTT grads
    (same algebra, different f32 summation order)."""
    from v2e2v_tpu.models.cista import cista_sequence

    # the equality is size-independent algebra; depth 2 / T=3 / b=1 keeps
    # the border kernels + BPTT coverage at a fraction of the compile cost
    cfg = CistaConfig(image_dim=(32, 40), base_channels=16, depth=2, num_bins=5)
    cfgp = CistaConfig(
        image_dim=(32, 40), base_channels=16, depth=2, num_bins=5,
        io_layout="parity",
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(13)
    seq = jnp.asarray(rng.normal(size=(3, 1, 32, 40, 5)).astype(np.float32))
    pi = jnp.asarray(rng.random((1, 32, 40, 1)).astype(np.float32))

    r0, s0 = cista_sequence(params, cfg, seq, prev_image=pi)
    r1, s1 = cista_sequence(params, cfgp, seq, prev_image=pi)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        s0, s1,
    )

    def loss(p, c):
        r, _ = cista_sequence(p, c, seq, prev_image=pi)
        return (r ** 2).mean()

    g0 = jax.jit(jax.grad(loss), static_argnums=1)(params, cfg)
    g1 = jax.jit(jax.grad(loss), static_argnums=1)(params, cfgp)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        ),
        g0, g1,
    )
