"""Platform selection helper.

A TPU-plugin ``sitecustomize`` may force ``jax_platforms`` at interpreter
startup, which silently overrides the ``JAX_PLATFORMS`` environment
variable. Entry points call :func:`honor_env_platform` before any backend
initializes so that ``JAX_PLATFORMS=cpu python scripts/train.py ...``
behaves as expected on any machine.
"""

import os

__all__ = ["honor_env_platform"]


def honor_env_platform():
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax
    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
