"""Fused half-res core kernel (ops/pallas/core.py) vs the XLA path.

Runs in interpret mode on the CPU test mesh; real-hardware perf is measured
by scripts/bench_core_kernel.py. The reference values come from the exact
ops the default path uses (conv_lstc_step, the ISTA python loop, Dg conv +
conv_lstm_step), so equality here pins the kernel to everything the
reference-parity suite already pins those ops to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc
from v2e2v_tpu.ops.conv import conv_layer, conv_lstc_step, conv_lstm_step
from v2e2v_tpu.ops.numerics import softshrink
from v2e2v_tpu.ops.pallas.core import cista_core_pallas, core_taps


def _xla_core(params, cfg, x1, z, cell, dg):
    z_new, cell_new = conv_lstc_step(params["P0"], x1, z, cell)
    lista = params["lista"]
    zi = z_new
    tmp = zi
    for _ in range(cfg.depth):
        tmp = conv_layer(tmp, lista["D"], padding=1)
        x = x1 - tmp
        x = conv_layer(x, lista["P"], padding=1)
        x = x + zi
        zi = softshrink(x, lista["Lambda"])
        tmp = zi
    xg = conv_layer(zi, params["Dg"]["conv"], padding=1, activation="relu")
    rec, dg_new = conv_lstm_step(params["Dg"]["lstm"], xg, dg)
    return rec, zi, cell_new, dg_new


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_core_kernel_matches_xla_path(dtype, tol):
    # H*W must be a multiple of the sublane tile and > 4 rows for the
    # vertical reflection; 16x32 = 512 rows covers both dtypes' tiles
    cfg = CistaConfig(image_dim=(32, 64), base_channels=16, depth=3, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    b, h2, w2, c = 2, 16, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x1 = jax.random.normal(ks[0], (b, h2, w2, c), dtype)
    z = 0.3 * jax.random.normal(ks[1], (b, h2, w2, 2 * c), dtype)
    cell = 0.3 * jax.random.normal(ks[2], (b, h2, w2, 2 * c), dtype)
    dg = (
        0.3 * jax.random.normal(ks[3], (b, h2, w2, c), dtype),
        0.3 * jax.random.normal(ks[4], (b, h2, w2, c), dtype),
    )

    want = _xla_core(params, cfg, x1, z, cell, dg)
    got = cista_core_pallas(
        core_taps(params, dtype), x1, z, cell, dg[0], dg[1],
        depth=cfg.depth, interpret=True,
    )

    names = ["rec", "z", "cell", "dg_h", "dg_c"]
    want_flat = [want[0], want[1], want[2], want[3][0], want[3][1]]
    for name, w_, g in zip(names, want_flat, got):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w_, np.float32),
            atol=tol, rtol=tol, err_msg=name,
        )


def test_core_impl_pallas_sequence_matches_xla(monkeypatch):
    """core_impl='pallas' through cista_sequence (taps injected once before
    the scan, state threading across steps, upsample/final tail) equals the
    default path over a 3-step sequence."""
    from functools import partial as _partial

    import v2e2v_tpu.ops.pallas.core as core_mod
    from v2e2v_tpu.models.cista import cista_sequence

    # force interpret mode inside the scan (no TPU in the test mesh)
    monkeypatch.setattr(
        core_mod, "cista_core_pallas",
        _partial(core_mod.cista_core_pallas, interpret=True),
    )

    cfg_x = CistaConfig(image_dim=(32, 64), base_channels=16, depth=2, num_bins=5)
    cfg_p = CistaConfig(
        image_dim=(32, 64), base_channels=16, depth=2, num_bins=5,
        core_impl="pallas",
    )
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg_x)
    seq = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 32, 64, 5))

    recs_x, st_x = cista_sequence(params, cfg_x, seq)
    recs_p, st_p = cista_sequence(params, cfg_p, seq)
    np.testing.assert_allclose(
        np.asarray(recs_p), np.asarray(recs_x), atol=2e-5, rtol=2e-5
    )
    for a, b_ in zip(jax.tree_util.tree_leaves(st_p), jax.tree_util.tree_leaves(st_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=2e-5)


def test_core_kernel_rec_equals_new_hidden():
    cfg = CistaConfig(image_dim=(32, 64), base_channels=16, depth=2, num_bins=5)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    b, h2, w2, c = 1, 16, 32, 16
    x1 = jax.random.normal(jax.random.PRNGKey(2), (b, h2, w2, c))
    zeros = lambda ch: jnp.zeros((b, h2, w2, ch))  # noqa: E731
    rec, _, _, dg_h, _ = cista_core_pallas(
        core_taps(params, jnp.float32), x1, zeros(2 * c), zeros(2 * c),
        zeros(c), zeros(c), depth=cfg.depth, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(dg_h))
