"""Deterministic distributed training workload (run as a subprocess).

Runs 3 E2V train steps on a (data=4, spatial=2) mesh over 8 devices —
either one process with 8 virtual CPU devices, or 2 processes x 4 devices
connected through ``jax.distributed`` (the spatial axis then crosses the
process boundary, so conv halo exchanges ride the cross-process collective
path). Prints ``RESULT loss=<f> psum=<f>`` at the end; both modes must
agree (tests/test_distributed.py).

``build()`` is shared with ``__graft_entry__._dryrun_multichip_impl`` so the
dryrun's single-process E2V leg IS this workload (same trace -> same
compiled program -> one cold compile total between them).

Env contract: ``V2E2V_COORDINATOR``/``V2E2V_NUM_PROCESSES``/
``V2E2V_PROCESS_ID`` (unset = single process); optional
``V2E2V_COMPILED_MARKER`` (file to touch once AOT compilation finishes, so
a parent can stagger-launch the sibling process against a warm cache).
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


def build():
    """Construct the deterministic workload: ``(step, params, opt_state,
    batches)`` on a (data=4, spatial=2) mesh of the 8 global devices."""
    mesh = make_mesh(4, 2)
    t, b, h, w, nb, ch = 2, 4, 16, 32, 5, 8
    cfg = CistaConfig(image_dim=(h, w), base_channels=ch, depth=2, num_bins=nb)
    params = init_cista_lstc(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-4)
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
    return step, params, opt_state, batches


def run(step, params, opt_state, batches):
    """AOT-compile, then run the 3 steps through the compiled executable.

    AOT + calling the ``Compiled`` object directly (instead of re-dispatching
    ``step``) guarantees exactly ONE compile per process; the compile
    happens BEFORE the cross-process barrier because Gloo's context init has
    a hard ~30s key-exchange timeout at first dispatch and per-process
    compile times vary minutes on this 1-core host.
    """
    import time

    wait_marker = os.environ.get("V2E2V_WAIT_MARKER")
    if wait_marker:
        # compile stagger (NOT registration stagger — jax.distributed init
        # blocks until every process registers, so all processes must LAUNCH
        # together): this process idles until the sibling finishes its cold
        # compile, then compiles warm from the shared persistent cache —
        # two concurrent cold compiles on a 1-core host each run at half
        # speed for zero benefit. Bounded: proceed anyway after 10 min.
        t0 = time.monotonic()
        while not os.path.exists(wait_marker) and time.monotonic() - t0 < 600:
            time.sleep(1.0)
    compiled = step.lower(params, opt_state, *batches[0]).compile()
    marker = os.environ.get("V2E2V_COMPILED_MARKER")
    if marker:
        # tells the parent it may now launch the sibling process (which
        # then compiles warm from the persistent cache)
        with open(marker, "w") as f:
            f.write("ok")
    if os.environ.get("V2E2V_NUM_PROCESSES"):
        # coordination-service barrier (NOT a device collective — a device
        # collective here would itself race Gloo's 30s context-init window)
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier(
            "dist_workload_compiled", timeout_in_ms=1_500_000
        )

    loss = None
    for voxel, gt in batches:
        params, opt_state, loss = compiled(params, opt_state, voxel, gt)

    loss = float(loss)
    psum = float(
        sum(float(jax.numpy.abs(x).sum()) for x in jax.tree_util.tree_leaves(params))
    )
    return loss, psum


def main():
    initialize_from_flags(None)
    assert len(jax.devices()) == 8, f"need 8 global devices, {len(jax.devices())}"
    loss, psum = run(*build())
    print(f"RESULT loss={loss:.6f} psum={psum:.4f}", flush=True)


if __name__ == "__main__":
    main()
