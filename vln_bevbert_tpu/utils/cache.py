"""Machine-keyed persistent compilation cache directories.

XLA:CPU AOT cache entries embed the *compile-time* machine features; loading
an entry produced on a host with different CPU features (e.g. a cache dir
carried across sandbox machines) can SIGILL/SIGABRT the process — XLA logs
"Machine type used for XLA:CPU compilation doesn't match" and the CPU cache
key does not include the full feature set. Keying the cache directory by a
host signature makes a stale cache simply miss instead of crash.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_signature() -> str:
    """Stable per-machine signature: arch + CPU flags (+ model name)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def machine_cache_dir(base: str) -> str:
    """``base/<host-signature>`` — created on first use."""
    path = os.path.join(base, host_signature())
    os.makedirs(path, exist_ok=True)
    return path


def enable_persistent_cache(base: str, min_compile_secs: float = 1.0):
    """Point jax's persistent compilation cache at the machine-keyed subdir
    of ``base``. Call before (or after) backend init — config updates apply
    to subsequent compiles."""
    import jax

    jax.config.update("jax_compilation_cache_dir", machine_cache_dir(base))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
