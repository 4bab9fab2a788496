"""Persistent XLA compilation cache setup, safe across heterogeneous hosts.

JAX's cache key covers the HLO and compile options but NOT the host
microarchitecture, and XLA:CPU serializes ahead-of-time executables compiled
for the build host's exact CPU features. Loading those on a different VM
generation emits "could lead to SIGILL" warnings and has produced real
segfaults mid-suite (observed in jax compilation_cache.put_executable_and_time
after hundreds of feature-mismatched AOT loads). CPU entries therefore live in
a per-host-fingerprint subdirectory; TPU entries are host-independent (the
executable targets the TPU, not the host CPU) and stay shared so expensive
Mosaic kernel compiles remain warm across VM rotations.
"""

import hashlib
import os

import jax


def _host_fingerprint() -> str:
    """Stable 12-hex id for this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = [
                ln for ln in f
                if ln.startswith(("flags", "model name", "cpu family"))
            ]
        blob = "".join(sorted(set(lines)))
    except OSError:  # non-Linux fallback: platform description
        import platform

        blob = platform.processor() + platform.machine()
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def setup_persistent_cache(base_dir: str | None = None) -> str:
    """Enable the persistent compilation cache; returns the directory used."""
    base = base_dir or os.environ.get(
        "RSTNET_JAX_CACHE", os.path.expanduser("~/.cache/rstnet_jax_cache")
    )
    if jax.default_backend() == "cpu":
        base = os.path.join(base, f"cpu-{_host_fingerprint()}")
    os.makedirs(base, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return base
