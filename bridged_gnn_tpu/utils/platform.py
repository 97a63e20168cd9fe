"""Platform pinning: make the JAX_PLATFORMS env var actually stick.

In environments where a TPU plugin (e.g. the tunneled 'axon' platform)
is installed, the plugin wins over the ``JAX_PLATFORMS`` environment
variable — ``JAX_PLATFORMS=cpu python …`` still initializes the TPU
backend. ``jax.config.update('jax_platforms', …)`` IS honored, so entry
points call this before any backend is initialized. No-op when the env
var is unset or a backend is already live.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:  # backend already initialized — leave it alone
        pass
