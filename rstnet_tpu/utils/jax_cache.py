"""Persistent XLA compilation cache setup, safe across heterogeneous hosts.

JAX's cache key covers the HLO and compile options but NOT the host
microarchitecture, and XLA:CPU serializes ahead-of-time executables compiled
for the build host's exact CPU features. Loading those on a different VM
generation emits "could lead to SIGILL" warnings and has produced real
segfaults mid-suite — the crash happens inside the deserializer, so it kills
the process before Python can catch anything (jax only recovers from cache
reads that raise *exceptions*, see ``jax._src.compiler._cache_read``).

Defense in depth, in order:

1. **Portable-ISA pin** — the test suite / dryrun call
   :func:`pin_portable_cpu_isa` before jax's backend initializes, pinning
   XLA:CPU codegen to a baseline ISA (``--xla_cpu_max_isa=AVX2``) so AOT
   executables only need features every host generation has.
2. **Tier gating on the parsed flag VALUE** — the shared
   ``cpu-portable-avx2-*`` directory is selected only when the *last*
   ``--xla_cpu_max_isa`` occurrence in ``XLA_FLAGS`` equals the canonical
   baseline. Any other pin (or none) routes to a per-host-fingerprint tier,
   so host-specific codegen can never land under the portable label.
3. **Versioned tier names** — tier directories embed a schema version and
   the jaxlib version, so entries written by an older layout (which may mix
   native-ISA executables under the portable label — the exact poisoning
   observed in round 2) or an incompatible serializer are never read.
4. **Validation of shared tiers** — every entry written since the tier's
   last validation is deserialized in a *sacrificial subprocess*
   (``cache_validate.py``); an entry that segfaults the subprocess is
   evicted and validation resumes after it. Only a tier proven
   deserializable is ever mounted. The validation marker is **cross-host**
   for pinned, AVX2-capable hosts (the portable invariant makes one pinned
   host's proof transfer to all — re-proving ~4k warm entries per fresh CI
   VM costs ~19 min on 1 vCPU, measured r4); unpinned or ISA-lacking hosts
   keep per-host markers.

TPU entries are host-independent (the executable targets the chip, not the
host CPU) and stale ones fail with clean exceptions that jax turns into
recompiles, so the TPU tier needs no validation — it keeps expensive Mosaic
kernel compiles warm across VM rotations.

Replaces: the reference has no compilation cache (PyTorch eager/torch.compile
re-JITs per process); this subsystem exists because the CI suite is
compile-dominated on a 1-vCPU host.

.. admonition:: jax 0.9 pitfall — the cache directory pins at FIRST compile

   jax's compilation-cache singleton (``jax._src.compilation_cache``)
   resolves and pins its backing directory lazily, at the process's first
   traced compile. After that point,
   ``jax.config.update("jax_compilation_cache_dir", ...)`` is **silently
   ignored** — the new value is stored in the config but the already-open
   file cache keeps writing to the original directory. Consequences:

   - :func:`setup_persistent_cache` must run before anything jits
     (conftest/bench do this at import time).
   - A test that wants its own throwaway cache dir must either perform its
     compile in a subprocess with ``JAX_COMPILATION_CACHE_DIR`` set in the
     environment (see ``tests/test_jax_cache.py::
     test_validator_subprocess_keeps_valid_entry``), or call
     ``jax._src.compilation_cache.reset_cache()`` after updating the config
     (private API; the subprocess route is preferred). Asserting that an
     in-process post-compile config update produced entries in the new dir
     is exactly the order-dependent failure seen in round 3: it passes only
     when no earlier test in the same worker ever compiled.
"""

import hashlib
import os
import subprocess
import sys
import tempfile
import time
import warnings

import jax

#: Baseline ISA for portable CPU cache entries. Every VM generation this CI
#: rotates through is x86-64-v3 or later; AVX2 code runs on all of them,
#: while the default (native) codegen may emit AVX-512/AMX instructions that
#: a future host could lack — and whose AOT cache entries trip the
#: cpu_aot_loader feature check today.
PORTABLE_CPU_ISA = "AVX2"

_ISA_FLAG = "--xla_cpu_max_isa"

#: Tier layout schema. Bump to orphan every previously written tier (e.g.
#: when the naming rules or validation protocol change incompatibly).
TIER_SCHEMA = 2

#: Give up and drop all remaining unvalidated entries after this many
#: subprocess crashes — a tier that poisoned is cheaper to recompile.
_MAX_EVICTIONS = 50


def _parse_isa_pin(flags: str | None = None) -> str | None:
    """The value of the last ``--xla_cpu_max_isa`` occurrence, or None.

    XLA honors the last occurrence of a repeated flag, so so do we. Both
    spellings XLA accepts are recognized: ``--xla_cpu_max_isa=VALUE`` and
    the space-separated ``--xla_cpu_max_isa VALUE`` (ADVICE r3: the
    two-token form used to parse as unpinned, cold-caching an AVX2 pin and
    double-appending a conflicting ``=AVX2``). A bare trailing
    ``--xla_cpu_max_isa`` with no value is treated as unpinned.
    """
    if flags is None:
        flags = os.environ.get("XLA_FLAGS", "")
    value = None
    toks = flags.split()
    for i, tok in enumerate(toks):
        if tok.startswith(_ISA_FLAG + "="):
            value = tok.split("=", 1)[1]
        elif tok == _ISA_FLAG and i + 1 < len(toks) and not toks[i + 1].startswith("-"):
            value = toks[i + 1]
    return value or None


def pin_portable_cpu_isa() -> bool:
    """Pin XLA:CPU codegen to the baseline ISA (call BEFORE jax backend init).

    Appends ``--xla_cpu_max_isa=AVX2`` to ``XLA_FLAGS`` so compiled (and
    cached) CPU executables are portable across host generations. Returns
    True when the portable pin is in effect for this process.

    - If an ISA pin is already present, it is respected (never overridden);
      the return value says whether it happens to equal the baseline.
    - If jax's backend already initialized, mutating ``XLA_FLAGS`` can no
      longer change codegen, so this warns and returns False instead of
      silently mislabeling native executables as portable.
    """
    current = _parse_isa_pin()
    if current is not None:
        return current.upper() == PORTABLE_CPU_ISA
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        warnings.warn(
            "pin_portable_cpu_isa() called after jax backend initialization; "
            "codegen is already native — falling back to the per-host cache "
            "tier for safety",
            stacklevel=2,
        )
        return False
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{flags} {_ISA_FLAG}={PORTABLE_CPU_ISA}".strip()
    return True


def _portable_pin_active() -> bool:
    pin = _parse_isa_pin()
    return pin is not None and pin.upper() == PORTABLE_CPU_ISA


def _host_supports_portable_isa() -> bool:
    """True when this host's CPU can execute ``PORTABLE_CPU_ISA`` code.

    The portable tier's invariant is that every entry was codegen'd at (or
    below) the AVX2 baseline, so any AVX2-capable host can load any entry —
    which is what lets one host trust another pinned host's validation
    marker. A host that cannot even execute AVX2 gets no such guarantee and
    must validate for itself.
    """
    try:
        with open("/proc/cpuinfo") as f:
            return PORTABLE_CPU_ISA.lower() in f.read()
    except OSError:
        return False


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


def _jaxlib_tag() -> str:
    import jaxlib

    return jaxlib.__version__.replace(".", "_")


def _cleanup_legacy_layout(base: str) -> None:
    """Remove pre-schema-2 artifacts from the cache base directory.

    - Loose ``*-cache`` entry files in the base dir (written before tiers
      existed; an unidentifiable mix of CPU and TPU-plugin entries — the CPU
      ones are the lethal class, so all are dropped).
    - Legacy tier directories (``cpu-portable-<isa>``, ``cpu-<fp>`` without
      a schema/jaxlib suffix): the portable one is known to mix pre-pin
      native-ISA entries under the portable label.
    """
    import re
    import shutil

    try:
        names = os.listdir(base)
    except OSError:
        return
    legacy_dir = re.compile(r"^cpu(-portable)?-[0-9a-z]+$")
    for name in names:
        path = os.path.join(base, name)
        try:
            if os.path.isfile(path) and name.endswith("-cache"):
                os.unlink(path)
            elif os.path.isdir(path) and legacy_dir.match(name):
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass


def _validator_script() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "cache_validate.py")


#: Per-ENTRY hang budget for the sacrificial validator. The clock resets
#: every time the child's progress file advances, so a large warm tier can
#: take arbitrarily long overall — only an entry showing no progress for
#: this whole budget is treated as hung (and evicted). Generous because the
#: first entry's "progress" includes the child's jax import + backend init
#: on a possibly 1-vCPU host. Override: RSTNET_CACHE_VALIDATE_ENTRY_TIMEOUT.
_PER_ENTRY_TIMEOUT = 180.0


def _run_validator(cmd: list, env: dict, progress: str,
                   per_entry_timeout: float) -> int:
    """Run the sacrificial validator subprocess, watching its progress file.

    Returns the child's exit code, or -1 when it was killed for hanging.
    Hang detection is per-entry, not per-run (ADVICE r3 medium: one fixed
    whole-run timeout evicted a healthy entry per attempt on hosts slow
    enough that honest deserialization of a big tier exceeded it): the
    deadline resets whenever the progress file's contents change, so the
    child is only killed after a full per-entry budget with NO advancement.
    """
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    last = None
    deadline = time.time() + per_entry_timeout
    try:
        while True:
            try:
                return proc.wait(timeout=0.25)
            except subprocess.TimeoutExpired:
                pass
            try:
                with open(progress) as f:
                    cur = f.read()
            except OSError:
                cur = None
            if cur != last:
                last = cur
                deadline = time.time() + per_entry_timeout
            if time.time() > deadline:
                proc.kill()
                proc.wait()
                return -1
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def _validate_shared_tier(tier: str, timeout: float | None = None) -> bool:
    """Prove this host can deserialize every entry in a shared tier.

    Entries newer than the tier's validation marker are deserialized in a
    sacrificial subprocess. A crash (SIGSEGV in XLA's AOT loader) or a
    per-entry hang (see :func:`_run_validator`) evicts the in-progress
    entry and validation resumes after it; entries that fail with clean
    exceptions are evicted by the subprocess itself. The marker is touched
    on success, so a fully validated tier costs one listdir per process.

    **The marker is cross-host** (``.validated/portable-<jaxlib>``) when the
    portable-ISA pin is active and this host can execute that ISA: the
    tier's invariant is that every entry targets the AVX2 baseline, so a
    load that succeeded on one pinned host succeeds on every AVX2-capable
    host with the same jaxlib — re-validating thousands of warm entries per
    fresh CI VM (~19 min at ~3.7 entries/s on a 1-vCPU host, measured r4)
    would buy nothing. Pre-r4 per-host markers (``<fingerprint>-<jaxlib>``)
    are adopted as the portable marker's initial timestamp, and hosts
    without the pin (or without the ISA) still validate per-host.

    ``timeout`` is the per-entry no-progress budget (seconds), defaulting
    to ``_PER_ENTRY_TIMEOUT`` / ``$RSTNET_CACHE_VALIDATE_ENTRY_TIMEOUT``.

    Returns False when validation could not run at all (the sacrificial
    subprocess fails before touching any entry — import error, bad env):
    the tier is left untouched and unmarked, and the caller must not mount
    it — an unvalidatable tier is indistinguishable from a poisoned one.
    """
    if timeout is None:
        timeout = float(os.environ.get(
            "RSTNET_CACHE_VALIDATE_ENTRY_TIMEOUT", _PER_ENTRY_TIMEOUT
        ))
    marker_dir = os.path.join(tier, ".validated")
    os.makedirs(marker_dir, exist_ok=True)
    marker, portable = _marker_path(marker_dir)
    # concurrent processes (pytest-xdist workers) dedupe through an
    # exclusive lock: the first validates, the rest then see a fresh marker
    import fcntl

    lock_path = os.path.join(marker_dir, ".lock")
    lock_f = open(lock_path, "w")
    try:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        if portable:
            _adopt_host_markers(marker_dir, marker)
        return _validate_shared_tier_locked(tier, marker, timeout)
    finally:
        fcntl.flock(lock_f, fcntl.LOCK_UN)
        lock_f.close()


def _marker_path(marker_dir: str) -> tuple:
    """(validation marker path, is-cross-host) for the active pin/host.

    Cross-host (``portable-<jaxlib>``) when the portable pin is active AND
    this host can execute the portable ISA; per-host fingerprint otherwise.
    """
    if _portable_pin_active() and _host_supports_portable_isa():
        return os.path.join(marker_dir, f"portable-{_jaxlib_tag()}"), True
    return (
        os.path.join(marker_dir, f"{_host_fingerprint()}-{_jaxlib_tag()}"),
        False,
    )


def _adopt_host_markers(marker_dir: str, portable_marker: str) -> None:
    """Seed the cross-host marker from pre-r4 per-host markers.

    Any ``<fingerprint>-<jaxlib>`` marker proves some pinned host validated
    the tier up to that marker's mtime; under the portable invariant that
    proof transfers, so the portable marker inherits the NEWEST such mtime
    (never moving backwards). Must run under the validation lock.
    """
    tag = _jaxlib_tag()
    best = None
    for name in os.listdir(marker_dir):
        if not name.endswith(f"-{tag}") or name.startswith("portable-"):
            continue
        try:
            mtime = os.stat(os.path.join(marker_dir, name)).st_mtime
        except OSError:
            continue
        best = mtime if best is None else max(best, mtime)
    if best is None:
        return
    try:
        current = os.stat(portable_marker).st_mtime
    except OSError:
        current = -1.0
    if best > current:
        with open(portable_marker, "a"):
            os.utime(portable_marker, (best, best))


def _validate_shared_tier_locked(tier: str, marker: str, timeout: float) -> bool:
    try:
        marker_mtime = os.stat(marker).st_mtime
    except OSError:
        marker_mtime = -1.0

    now = time.time()
    entries = []
    for name in os.listdir(tier):
        path = os.path.join(tier, name)
        if not (name.endswith("-cache") and os.path.isfile(path)):
            continue
        try:
            if os.stat(path).st_mtime > marker_mtime:
                entries.append(name)
        except OSError:
            pass
    if not entries:
        with open(marker, "a"):
            os.utime(marker, (now, now))
        return True

    entries.sort()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # match the device count the suite/dryrun writers use, so executables
    # compiled for the 8-device virtual mesh can be loaded
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    env["XLA_FLAGS"] = flags.strip()

    with tempfile.TemporaryDirectory(prefix="rstnet-cachecheck-") as tmp:
        listfile = os.path.join(tmp, "entries.txt")
        progress = os.path.join(tmp, "progress.txt")
        with open(listfile, "w") as f:
            f.write("\n".join(entries))
        start = 0
        evicted = 0
        while start < len(entries):
            # stale progress from a previous attempt must never be read as
            # this attempt's position
            try:
                os.unlink(progress)
            except OSError:
                pass
            rc = _run_validator(
                [sys.executable, _validator_script(), tier, listfile,
                 progress, str(start)],
                env, progress, timeout,
            )
            if rc == 0:
                break
            # Crashed, or hung on one entry for the full per-entry budget:
            # the progress file names the entry it was working on — evict it
            # and resume after. No progress file (or one from before
            # `start`) means the child died before touching
            # any entry: an environment failure, not a poisoned entry.
            # Evicting would destroy healthy entries one by one, so leave
            # the tier untouched and unmarked and tell the caller.
            bad_idx = None
            try:
                with open(progress) as f:
                    bad_idx = int(f.read().split()[0])
            except (OSError, ValueError, IndexError):
                pass
            if bad_idx is None or not start <= bad_idx < len(entries):
                warnings.warn(
                    "compile-cache validator subprocess failed before "
                    f"processing any entry (rc={rc}); leaving the shared "
                    "tier unvalidated",
                    stacklevel=2,
                )
                return False
            try:
                os.unlink(os.path.join(tier, entries[bad_idx]))
            except OSError:
                pass
            evicted += 1
            warnings.warn(
                f"evicted compile-cache entry that crashed this host's "
                f"deserializer: {entries[bad_idx]}",
                stacklevel=2,
            )
            start = bad_idx + 1
            if evicted >= _MAX_EVICTIONS:
                # poisoned tier: drop everything not yet proven
                for name in entries[start:]:
                    try:
                        os.unlink(os.path.join(tier, name))
                    except OSError:
                        pass
                break
    with open(marker, "a"):
        os.utime(marker, (now, now))
    return True


def setup_persistent_cache(
    base_dir: str | None = None, validate: bool = True
) -> str:
    """Enable the persistent compilation cache; returns the directory used."""
    base = base_dir or os.environ.get(
        "RSTNET_JAX_CACHE", os.path.expanduser("~/.cache/rstnet_jax_cache")
    )
    os.makedirs(base, exist_ok=True)
    _cleanup_legacy_layout(base)
    backend = jax.default_backend()
    if backend == "cpu":
        if _portable_pin_active():
            tier = os.path.join(
                base,
                f"cpu-portable-{PORTABLE_CPU_ISA.lower()}"
                f"-v{TIER_SCHEMA}-jaxlib{_jaxlib_tag()}",
            )
            shared = True
        else:
            tier = os.path.join(
                base,
                f"cpu-{_host_fingerprint()}-v{TIER_SCHEMA}-jaxlib{_jaxlib_tag()}",
            )
            shared = False
    else:
        # chip-targeted executables: host-independent, and stale/mismatched
        # entries fail with clean exceptions jax converts into recompiles
        tier = os.path.join(base, f"{backend}-v{TIER_SCHEMA}")
        shared = False
    os.makedirs(tier, exist_ok=True)
    if shared and validate and not _validate_shared_tier(tier):
        # this host could not prove the shared tier safe — fall back to the
        # (cold but crash-proof) per-host tier rather than gamble
        tier = os.path.join(
            base,
            f"cpu-{_host_fingerprint()}-v{TIER_SCHEMA}-jaxlib{_jaxlib_tag()}",
        )
        os.makedirs(tier, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", tier)
    # A small-but-nonzero write threshold: XLA:CPU's executable.serialize()
    # has segfaulted nondeterministically after hundreds of writes in one
    # process (observed twice, both times late in a cold full-suite run, in
    # put_executable_and_time). Skipping the sub-100ms micro-compiles cuts
    # the per-process write count several-fold at negligible warmth cost
    # (those recompile faster than they deserialize); reads are unaffected,
    # and a fully-warm cache performs no writes at all.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return tier
