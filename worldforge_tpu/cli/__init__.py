"""CLI entry points (flag surfaces mirror the reference scripts).

Set ``WFTPU_PLATFORM=cpu`` to force a JAX backend for smoke runs: plain
``JAX_PLATFORMS`` is overridden by TPU plugins in some environments, while
``jax.config.update`` (applied here, before any backend is initialized —
this package __init__ runs before every ``python -m worldforge_tpu.cli.*``
module) always wins.
"""

import os

if os.environ.get("WFTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["WFTPU_PLATFORM"])
