"""Deterministic distributed training workload (run as a subprocess).

Runs 3 E2V train steps on a (data=4, spatial=2) mesh over 8 devices —
either one process with 8 virtual CPU devices, or 2 processes x 4 devices
connected through ``jax.distributed`` (the spatial axis then crosses the
process boundary, so conv halo exchanges ride the cross-process collective
path). Prints ``RESULT loss=<f> psum=<f>`` at the end; both modes must
agree (tests/test_distributed.py).

Env contract: ``V2E2V_COORDINATOR``/``V2E2V_NUM_PROCESSES``/
``V2E2V_PROCESS_ID`` (unset = single process).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import optax  # noqa: E402

from v2e2v_tpu.models.cista import CistaConfig, init_cista_lstc  # noqa: E402
from v2e2v_tpu.parallel.distributed import (  # noqa: E402
    global_batch,
    initialize_from_flags,
)
from v2e2v_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_e2v_train_step,
    make_mesh,
)


def main():
    initialize_from_flags(None)
    assert len(jax.devices()) == 8, f"need 8 global devices, {len(jax.devices())}"

    mesh = make_mesh(4, 2)
    t, b, h, w, nb, ch = 2, 4, 16, 32, 5, 8
    cfg = CistaConfig(image_dim=(h, w), base_channels=ch, depth=2, num_bins=nb)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_e2v_train_step(cfg, tx, mesh)

    rng = np.random.default_rng(7)
    seq_shard = batch_sharding(mesh, time_leading=True)
    gt_shard = batch_sharding(mesh, time_leading=False)

    batches = []
    for _ in range(3):
        voxel_np = rng.normal(size=(t, b, h, w, nb)).astype(np.float32)
        gt_np = rng.uniform(size=(b, h, w, 1)).astype(np.float32)
        batches.append(
            (global_batch(voxel_np, seq_shard), global_batch(gt_np, gt_shard))
        )

    # AOT-compile BEFORE the cross-process barrier: Gloo's context init has
    # a hard ~30s key-exchange timeout at first dispatch, and per-process
    # compile times vary minutes on this host (per-process cache keys). The
    # coordination-service barrier below has a generous timeout, so after it
    # both processes dispatch together and Gloo connects in milliseconds.
    step.lower(params, opt_state, *batches[0]).compile()
    if os.environ.get("V2E2V_NUM_PROCESSES"):
        # coordination-service barrier (NOT a device collective — a device
        # collective here would itself race Gloo's 30s context-init window)
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier(
            "dist_workload_compiled", timeout_in_ms=1_500_000
        )

    loss = None
    for voxel, gt in batches:
        params, opt_state, loss = step(params, opt_state, voxel, gt)

    loss = float(loss)
    psum = float(
        sum(float(jax.numpy.abs(x).sum()) for x in jax.tree_util.tree_leaves(params))
    )
    print(f"RESULT loss={loss:.6f} psum={psum:.4f}", flush=True)


if __name__ == "__main__":
    main()
