"""JAX platform selection for CLI entry points.

The hosting environment may pre-select a TPU platform via JAX_PLATFORMS and a
site customization that overrides the env var; ``select_platform`` makes the
user's ``--device`` choice stick regardless.
"""

from __future__ import annotations

import os
from typing import Optional


def select_platform(device: str = "auto") -> None:
    """device: 'auto' (leave as-is), 'cpu', or 'tpu'. Must be called before
    any JAX computation runs."""
    enable_compilation_cache()
    if device == "auto":
        return
    import jax

    if device == "tpu":
        # If the environment already points at an accelerator platform
        # (e.g. a TPU plugin like 'axon'), leave it alone — forcing the name
        # through jax.config can race the plugin's registration. Only undo an
        # explicit cpu override.
        plat = os.environ.get("JAX_PLATFORMS", "")
        if plat == "cpu":
            os.environ["JAX_PLATFORMS"] = ""
            jax.config.update("jax_platforms", None)
    else:
        os.environ["JAX_PLATFORMS"] = device
        jax.config.update("jax_platforms", device)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist XLA compilations across processes (~/.cache/tpumil/jax by
    default) so repeat CLI invocations skip recompiles. Called by
    select_platform; set TPUMIL_NO_COMPILE_CACHE=1 to disable."""
    if os.environ.get("TPUMIL_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpumil", "jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only home: caching is best-effort


def default_matmul_precision(precision: str = "highest") -> None:
    """f32 matmuls on TPU default to bf16 inputs; training parity tests want
    'highest'. Production feature extraction uses explicit bf16 instead."""
    import jax

    jax.config.update("jax_default_matmul_precision", precision)
