"""Persistent XLA compilation cache setup, safe across heterogeneous hosts.

JAX's cache key covers the HLO and compile options but NOT the host
microarchitecture, and XLA:CPU serializes ahead-of-time executables compiled
for the build host's exact CPU features. Loading those on a different VM
generation emits "could lead to SIGILL" warnings and has produced real
segfaults mid-suite (observed in jax compilation_cache.put_executable_and_time
after hundreds of feature-mismatched AOT loads).

Two tiers of safety:

- **Portable mode** (default for the test suite / dryrun, which set
  ``pin_portable_cpu_isa()`` before jax's backend initializes): codegen is
  pinned to a baseline ISA via ``--xla_cpu_max_isa`` so the AOT executable
  only requires features every host generation has; entries live in a shared
  ``cpu-portable-<isa>`` subdirectory and stay warm across VM rotations.
  This matters because CI VMs rotate between rounds: per-host isolation
  alone means every round pays the full cold-compile cost again (tens of
  minutes on this 1-vCPU machine).
- **Fingerprint mode** (fallback when the pin was not applied in time):
  entries live in a per-host-fingerprint subdirectory, trading warmth for
  the guarantee that host-specific codegen is never loaded elsewhere.

TPU entries are host-independent (the executable targets the chip, not the
host CPU) and always share the base directory, so expensive Mosaic kernel
compiles remain warm across VM rotations.
"""

import hashlib
import os

import jax

#: Baseline ISA for portable CPU cache entries. Every VM generation this CI
#: rotates through is x86-64-v3 or later; AVX2 code runs on all of them,
#: while the default (native) codegen may emit AVX-512/AMX instructions that
#: a future host could lack — and whose AOT cache entries trip the
#: cpu_aot_loader feature check today.
PORTABLE_CPU_ISA = "AVX2"

_ISA_FLAG = "--xla_cpu_max_isa"


def pin_portable_cpu_isa() -> None:
    """Pin XLA:CPU codegen to the baseline ISA (call BEFORE jax backend init).

    Appends ``--xla_cpu_max_isa=AVX2`` to ``XLA_FLAGS`` so compiled (and
    cached) CPU executables are portable across host generations. Must run
    before the first jax backend use in the process; later calls are no-ops
    for that process, which is why callers that re-exec (the multichip
    dryrun) propagate XLA_FLAGS to the child environment.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if _ISA_FLAG not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} {_ISA_FLAG}={PORTABLE_CPU_ISA}".strip()


def _portable_pin_active() -> bool:
    return _ISA_FLAG in os.environ.get("XLA_FLAGS", "")


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
        if _portable_pin_active():
            base = os.path.join(base, f"cpu-portable-{PORTABLE_CPU_ISA.lower()}")
        else:
            base = os.path.join(base, f"cpu-{_host_fingerprint()}")
    os.makedirs(base, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", base)
    # A small-but-nonzero write threshold: XLA:CPU's executable.serialize()
    # has segfaulted nondeterministically after hundreds of writes in one
    # process (observed twice, both times late in a cold full-suite run, in
    # put_executable_and_time). Skipping the sub-100ms micro-compiles cuts
    # the per-process write count several-fold at negligible warmth cost
    # (those recompile faster than they deserialize); reads are unaffected,
    # and a fully-warm cache performs no writes at all.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return base
