"""JAX platform selection for CLI entry points.

The hosting environment may pre-select a TPU platform via JAX_PLATFORMS and a
site customization that overrides the env var; ``select_platform`` makes the
user's ``--device`` choice stick regardless.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple


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


def probe_backend(attempts: int = 3, timeout_s: float = 90.0,
                  with_matmul: bool = True,
                  log: Optional[Callable[[str], None]] = None,
                  ) -> Tuple[bool, str]:
    """Bounded, retried JAX-backend liveness probe in a SUBPROCESS.

    Round-3 lesson: an unbounded in-process backend init on a dead TPU
    tunnel hangs indefinitely with zero output. The child lists devices
    (and optionally runs a tiny matmul) under a hard timeout, retried with
    backoff, so a wedged tunnel becomes a fast, explained failure. Shared
    by bench.py and __graft_entry__ — keep the single copy here.

    Returns ``(ok, detail)``: detail is the device summary on success, the
    last failure message otherwise. ``log`` receives one line per attempt
    ("probe 1/3 (timeout 90s)") and per failure.

    The per-attempt timeout escalates 1.5x per retry (90 -> 135 -> 202s by
    default): a COLD tunnel's first device touch can legitimately exceed the
    base timeout while it warms (measured round 4: first touch ~4 min, then
    43 s), and warm-up progress survives across killed probe children — so
    later, longer attempts convert "cold but alive" into success while a
    truly dead tunnel still fails in bounded time.
    """
    import subprocess
    import sys
    import time

    # honor an explicit JAX_PLATFORMS in the child despite the axon site
    # hook that overrides the env var (CLAUDE.md: forcing a platform needs
    # BOTH the env var and the config update)
    code = ("import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
            "p and jax.config.update('jax_platforms', p); "
            "import jax.numpy as jnp; d = jax.devices(); ")
    if with_matmul:
        code += ("x = jnp.ones((8, 8)); s = float((x @ x).sum()); "
                 "print(d[0].platform, len(d), s)")
    else:
        code += "print(d[0].platform, len(d))"
    log = log or (lambda s: None)
    last = "unknown"
    for i in range(1, attempts + 1):
        t = timeout_s * (1.5 ** (i - 1))
        log(f"probe {i}/{attempts} (timeout {t:.0f}s)")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=t)
        except subprocess.TimeoutExpired:
            last = f"probe subprocess exceeded {t:.0f}s"
        else:
            if r.returncode == 0:
                return True, r.stdout.strip()
            tail = (r.stderr or r.stdout).strip().splitlines()
            last = tail[-1] if tail else f"probe rc={r.returncode}"
        log(f"probe failed: {last}")
        if i < attempts:
            time.sleep(5.0 * i)
    return False, last


def default_matmul_precision(precision: str = "highest") -> None:
    """f32 matmuls on TPU default to bf16 inputs; training parity tests want
    'highest'. Production feature extraction uses explicit bf16 instead."""
    import jax

    jax.config.update("jax_default_matmul_precision", precision)
