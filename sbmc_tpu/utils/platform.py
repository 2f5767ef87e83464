"""Platform selection helper.

A TPU-plugin ``sitecustomize`` may force ``jax_platforms`` at interpreter
startup, which silently overrides the ``JAX_PLATFORMS`` environment
variable. Entry points call :func:`honor_env_platform` before any backend
initializes so that ``JAX_PLATFORMS=cpu python scripts/train.py ...``
behaves as expected on any machine.
"""

import os

__all__ = ["honor_env_platform", "enable_compilation_cache"]


def honor_env_platform():
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax
        try:
            current = jax.config.jax_platforms
        except AttributeError:
            current = None
        if current != env:
            jax.config.update("jax_platforms", env)
    enable_compilation_cache()


def enable_compilation_cache():
    """Enable jax's persistent compilation cache (TPU compiles of the big
    model/tracer graphs take 10s-600s over the remote compile service;
    caching them on disk makes every entry-point restart cheap). Opt out
    with ``SBMC_NO_COMPILE_CACHE=1``."""
    if os.environ.get("SBMC_NO_COMPILE_CACHE"):
        return
    import jax
    # Default the cache into the repo (not /tmp): the scratch disk is wiped
    # between sessions, and the first TPU compile of the big train/tracer
    # graphs costs minutes over the remote compile service each time.
    default_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
