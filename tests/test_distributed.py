"""Multi-process distributed path: 2 processes x 4 virtual CPU devices must
train identically to 1 process x 8 devices (the standard XLA substitute for
multi-host hardware — SURVEY.md §4(e)/§5 distributed row).

The workload (tests/_dist_workload.py) uses a (data=4, spatial=2) mesh, so
in 2-process mode the spatial halo exchanges and the gradient psum BOTH
cross the process boundary.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKLOAD = os.path.join(_HERE, "_dist_workload.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(env_extra, n_local_devices):
    env = {
        k: v
        for k, v in os.environ.items()
        if "xla_force_host_platform_device_count" not in v
        or k != "XLA_FLAGS"
    }
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    # persistent compile cache: the workload costs minutes of XLA CPU
    # compile on this 1-core host and the 2-process leg compiles the same
    # program twice concurrently (see __graft_entry__._enable_compile_cache)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(_HERE, os.pardir, ".jax_cache"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, _WORKLOAD],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _parse(stdout: str):
    m = re.search(r"RESULT loss=([-\d.eE]+) psum=([-\d.eE]+)", stdout)
    assert m, f"no RESULT line in: {stdout!r}"
    return float(m.group(1)), float(m.group(2))


def test_two_process_training_matches_single_process():
    # single process, 8 virtual devices
    p = _run({}, n_local_devices=8)
    out, err = p.communicate(timeout=1800)
    assert p.returncode == 0, f"single-process run failed:\n{err[-3000:]}"
    loss1, psum1 = _parse(out)

    # two processes x 4 devices with a local coordinator
    port = _free_port()
    procs = [
        _run(
            {
                "V2E2V_COORDINATOR": f"localhost:{port}",
                "V2E2V_NUM_PROCESSES": "2",
                "V2E2V_PROCESS_ID": str(i),
            },
            n_local_devices=4,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        # 2 concurrent cold-cache compiles share the 1-core host
        out, err = p.communicate(timeout=1800)
        assert p.returncode == 0, f"process {i} failed:\n{err[-3000:]}"
        outs.append(out)

    for out in outs:  # every process computes the same replicated result
        loss2, psum2 = _parse(out)
        assert abs(loss1 - loss2) < 1e-5 * max(1.0, abs(loss1))
        assert abs(psum1 - psum2) < 1e-4 * max(1.0, abs(psum1))
