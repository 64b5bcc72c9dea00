"""Tracing / debugging hooks (SURVEY.md §5 aux subsystems).

The reference has no profiling or sanitizers (progress prints only). Here:
``maybe_profile`` wraps a region in a ``jax.profiler`` trace when the CLI
flag ``--profile_dir`` is set, and ``enable_nan_debugging`` turns on
``jax_debug_nans`` (the TPU-appropriate race/NaN sanitizer analog).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None):
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enabled: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enabled)


def apply_platform_override() -> None:
    """Honor ``V2E2V_PLATFORM`` (e.g. 'cpu') — this environment's TPU plugin
    forces ``jax_platforms`` at interpreter start, so a plain JAX_PLATFORMS
    env var is ignored; CLIs call this before first backend use.

    Also points JAX at the repo's persistent compile cache (compiles of the
    big whole-window train steps run minutes; reruns should be warm). Set
    ``V2E2V_NO_COMPILE_CACHE=1`` to disable."""
    import os

    import jax

    platform = os.environ.get("V2E2V_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    if not os.environ.get("V2E2V_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
