"""Platform selection hardening for this box's TPU plugin.

The environment's sitecustomize hook registers the experimental TPU
backend at interpreter startup and flips ``jax_platforms`` to it, so
``env JAX_PLATFORMS=cpu <prog>`` alone does NOT force CPU — the config
must be re-asserted in-process after importing jax (the pattern used by
``tests/conftest.py`` and ``__graft_entry__.py``).  Reference analogue:
the fail-fast device-selection policy of ``cutilSafeCall``
(reference: src/hydro/cutil_inline_runtime.h).
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Re-assert the caller's JAX_PLATFORMS choice in-process.

    Call before the first jax device/compile use.  A no-op when the env
    var is unset/empty (keep whatever the plugin selected).
    """
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    import jax

    try:
        current = jax.config.jax_platforms or ""
    except Exception:
        current = ""
    # Only restore the env choice when the plugin's import-time override is
    # still in effect ("axon" present).  If the embedding code already did
    # jax.config.update('jax_platforms', 'cpu') in-process (the pattern in
    # tests/conftest.py), the config no longer mentions the plugin and must
    # NOT be clobbered back to the session's baked JAX_PLATFORMS value.
    if "axon" not in current or current == want:
        return
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized; too late to switch


def probe_device_alive(timeout_s: float = 240.0) -> tuple[bool, str]:
    """Check that ``jax.devices()`` answers within ``timeout_s`` in a
    fresh subprocess.

    A TPU-side kernel crash wedges this box's device tunnel such that
    every subsequent backend init hangs indefinitely (not an error — a
    hang).  Probing in a subprocess keeps the hang killable and the
    parent interpreter clean.  Returns (alive, detail).
    """
    import subprocess
    import sys

    code = (
        "import jax, sys\n"
        "import os\n"
        "w = os.environ.get('JAX_PLATFORMS', '').strip()\n"
        "if w:\n"
        "    jax.config.update('jax_platforms', w)\n"
        "d = jax.devices()\n"
        "import jax.numpy as jnp\n"
        "x = float(jnp.arange(8).sum())\n"
        "print(f'{d[0].platform}:{len(d)}:{x}')\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"device probe hung past {timeout_s:.0f}s (tunnel wedged?)"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:]
        return False, f"device probe failed rc={proc.returncode}: {' '.join(tail)}"
    return True, proc.stdout.strip().splitlines()[-1]


# Error-text markers that mean the backend itself is dead/unreachable —
# retrying (or retrying smaller problem sizes) cannot succeed and only
# burns wall-clock against a wedged tunnel.
_FATAL_BACKEND_MARKERS = (
    "unable to initialize backend",
    "unavailable",
    "deadline_exceeded",
    "backend setup/compile error",
    "failed_precondition",
    "is not in the list of known backends",
)

_OOM_MARKERS = (
    "resource_exhausted",
    "out of memory",
    "oom",
    "attempting to allocate",
    "exceeds the limit",
)


def classify_bench_error(exc: BaseException) -> str:
    """'fatal' (backend dead — stop now), 'oom' (retry smaller), or
    'other'."""
    text = f"{type(exc).__name__}: {exc}".lower()
    if any(m in text for m in _OOM_MARKERS):
        return "oom"
    if any(m in text for m in _FATAL_BACKEND_MARKERS):
        return "fatal"
    return "other"
