"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard XLA way — fake host devices —
since real multi-chip hardware is not present (SURVEY.md §4e).

Note: the environment registers the TPU PJRT plugin at interpreter start and
forces ``jax_platforms``, so a plain env var is not enough — we override the
jax config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-bound on this 1-core
# host (~50 min cold); warm reruns skip every previously-seen program. Same
# cache dir the dryrun/distributed subprocesses use (__graft_entry__.py).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
