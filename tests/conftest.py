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
