"""Fused Pallas ISTA kernel vs the XLA reference path (interpret mode on the
CPU mesh; the compiled kernel is exercised on real TPU by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.ops.conv import conv_layer
from v2e2v_tpu.ops.numerics import softshrink
from v2e2v_tpu.ops.pallas.ista import ista_loop_pallas


def _setup(b=2, h=16, w=24, c=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x1 = (0.5 * jax.random.normal(ks[0], (b, h, w, c))).astype(jnp.float32)
    z0 = (0.5 * jax.random.normal(ks[1], (b, h, w, 2 * c))).astype(jnp.float32)
    dw = (0.05 * jax.random.normal(ks[2], (3, 3, 2 * c, c))).astype(jnp.float32)
    db = (0.05 * jax.random.normal(ks[3], (c,))).astype(jnp.float32)
    pw = (0.05 * jax.random.normal(ks[4], (3, 3, c, 2 * c))).astype(jnp.float32)
    pb = (0.05 * jax.random.normal(ks[5], (2 * c,))).astype(jnp.float32)
    lam = (0.01 * jax.random.uniform(ks[6], (2 * c,))).astype(jnp.float32)
    return x1, z0, dw, db, pw, pb, lam


def _xla_ista(x1, z, dw, db, pw, pb, lam, depth):
    d = {"weight": dw, "bias": db}
    p = {"weight": pw, "bias": pb}
    tmp = z
    for _ in range(depth):
        tmp = conv_layer(tmp, d, padding=1)
        x = conv_layer(x1 - tmp, p, padding=1) + z
        z = softshrink(x, lam)
        tmp = z
    return z


@pytest.mark.parametrize("depth", [1, 3, 5])
def test_pallas_ista_matches_xla(depth):
    x1, z0, dw, db, pw, pb, lam = _setup()
    got = ista_loop_pallas(x1, z0, dw, db, pw, pb, lam, depth=depth, interpret=True)
    want = _xla_ista(x1, z0, dw, db, pw, pb, lam, depth)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_ista_nonsquare_and_batched():
    x1, z0, dw, db, pw, pb, lam = _setup(b=3, h=24, w=16, seed=1)
    got = ista_loop_pallas(x1, z0, dw, db, pw, pb, lam, depth=2, interpret=True)
    want = _xla_ista(x1, z0, dw, db, pw, pb, lam, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
