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
   deserializable is ever mounted.

   Proof transfer between hosts is restricted to what a validation run
   actually proves (ADVICE r4 high): a host successfully loading an entry
   proves the entry needs no CPU feature *that host lacks* — nothing more.
   So the cross-host ``portable-*`` marker is **stamped only by hosts whose
   own feature set is the AVX2 baseline with nothing above it** (no
   AVX-512/AMX/AVX-VNNI): their success proves every entry is ≤AVX2, which
   every AVX2-capable host can then trust without re-validating (~4k warm
   entries ≈ 19 min per fresh CI VM on 1 vCPU, measured r4). A host with
   features beyond the baseline would load a >AVX2-poisoned entry without
   noticing, so its proof stays under its own per-host fingerprint marker —
   it still *reads* the portable marker (trusting the sound stampers), it
   just cannot write it. Marker mtimes are clamped to the present when read,
   so a future-dated marker (cross-host clock skew on shared storage) can
   never exempt writes newer than the reader's own clock (ADVICE r4
   medium/low: the pre-r5 scheme adopted foreign per-host markers' mtimes
   verbatim, letting a skewed donor exempt any host's writes inside the skew
   window; adoption of foreign-fingerprint markers is removed outright —
   their hosts' ISAs are unknown, so their proofs do not transfer).

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


def _host_cpu_flags() -> frozenset:
    """The CPU feature flags of this host, lowercase, or empty if unknown."""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("flags"):
                    return frozenset(ln.split(":", 1)[1].lower().split())
    except OSError:
        pass
    return frozenset()


def _host_supports_portable_isa() -> bool:
    """True when this host's CPU can execute ``PORTABLE_CPU_ISA`` code.

    The portable tier's invariant is that every entry was codegen'd at (or
    below) the AVX2 baseline, so any AVX2-capable host can load any entry —
    which is what lets it trust the portable validation marker (stamped
    only by hosts whose success proves that invariant, see
    :func:`_host_isa_beyond_portable`). A host that cannot even execute
    AVX2 gets no such guarantee and must validate for itself.
    """
    return PORTABLE_CPU_ISA.lower() in _host_cpu_flags()


#: CPU feature flags whose presence means this host could successfully load
#: executables that exceed the AVX2 baseline — so its validation success
#: proves nothing about portability. Prefix-matched against /proc/cpuinfo
#: flags (``avx512f``, ``avx512dq``, …, ``amx_bf16``, ``amx_tile``, …,
#: ``avx_vnni``/``avxvnni`` and friends).
_BEYOND_PORTABLE_PREFIXES = ("avx512", "amx", "avx_vnni", "avxvnni",
                             "avx_ifma", "avxifma", "avx_ne_convert",
                             "avxneconvert")


def _host_isa_beyond_portable() -> bool:
    """True when this host can execute vector code ABOVE the AVX2 baseline.

    Such a host loads a >AVX2-poisoned entry without noticing, so a
    validation run on it cannot prove the portable invariant and must not
    stamp the cross-host marker (ADVICE r4 high). Unknown feature sets
    (no /proc/cpuinfo) conservatively count as beyond-baseline: soundness
    is never claimed blind.
    """
    flags = _host_cpu_flags()
    if not flags:
        return True
    return any(f.startswith(_BEYOND_PORTABLE_PREFIXES) for f in flags)


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

    Trust and stamping are asymmetric (ADVICE r4 high — see the module
    docstring, layer 4): a pinned AVX2-capable host *reads* both the
    cross-host ``.validated/portable-<jaxlib>`` marker and its own
    fingerprint marker (newest wins, mtimes clamped to the present so clock
    skew can never exempt future writes), but *writes* the portable marker
    only when its own feature set is AVX2-with-nothing-above — the only
    host class whose successful loads prove the portable invariant.
    Beyond-baseline, unpinned, and ISA-lacking hosts stamp their own
    fingerprint marker. Foreign fingerprint markers are never trusted:
    their hosts' ISAs are unknown, so their proofs do not transfer.

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
    # concurrent processes (pytest-xdist workers) dedupe through an
    # exclusive lock: the first validates, the rest then see a fresh marker
    import fcntl

    lock_path = os.path.join(marker_dir, ".lock")
    lock_f = open(lock_path, "w")
    try:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        return _validate_shared_tier_locked(
            tier, _trusted_marker_mtime(marker_dir),
            _marker_path(marker_dir)[0], timeout,
        )
    finally:
        fcntl.flock(lock_f, fcntl.LOCK_UN)
        lock_f.close()


def _portable_marker(marker_dir: str) -> str:
    return os.path.join(marker_dir, f"portable-{_jaxlib_tag()}")


def _host_marker(marker_dir: str) -> str:
    return os.path.join(marker_dir, f"{_host_fingerprint()}-{_jaxlib_tag()}")


def _marker_path(marker_dir: str) -> tuple:
    """(marker path this host STAMPS after validating, is-cross-host).

    Cross-host (``portable-<jaxlib>``) only when the portable pin is active
    AND this host's feature set is exactly the baseline class — AVX2 with
    nothing above it — because only then does a successful validation prove
    every entry is ≤AVX2 (ADVICE r4 high). Per-host fingerprint otherwise.
    """
    if (
        _portable_pin_active()
        and _host_supports_portable_isa()
        and not _host_isa_beyond_portable()
    ):
        return _portable_marker(marker_dir), True
    return _host_marker(marker_dir), False


def _trusted_marker_mtime(marker_dir: str) -> float:
    """Newest validation timestamp this host may trust, clamped to now.

    Sources: this host's own fingerprint marker (its own past proof), plus
    the cross-host portable marker when the pin is active and this host can
    execute the portable ISA (the stamper's proof transfers — stampers are
    AVX2-only hosts, see :func:`_marker_path`). Foreign fingerprint markers
    are never consulted. Each mtime is clamped to the present so a
    future-dated marker — cross-host clock skew on shared storage — can
    never exempt entries written after the reader's own clock (ADVICE r4
    medium).
    """
    now = time.time()
    candidates = [_host_marker(marker_dir)]
    if _portable_pin_active() and _host_supports_portable_isa():
        candidates.append(_portable_marker(marker_dir))
    best = -1.0
    for path in candidates:
        try:
            best = max(best, min(os.stat(path).st_mtime, now))
        except OSError:
            pass
    return best


def _validate_shared_tier_locked(
    tier: str, marker_mtime: float, marker: str, timeout: float
) -> bool:
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
        _stamp_marker(marker, now)
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
    _stamp_marker(marker, now)
    return True


def _stamp_marker(marker: str, now: float) -> None:
    """Record a successful validation at ``now`` (captured BEFORE the entry
    listing, so entries racing in during validation stay newer than the
    marker and are validated next start). Monotone: never moves an existing
    marker backwards (ADVICE r4 low — readers clamp to their own clock
    anyway, so keeping a future-dated stamp is safe, while rewinding it
    would make other hosts churn re-validation until wall clock caught up).
    """
    try:
        existing = os.stat(marker).st_mtime
    except OSError:
        existing = -1.0
    ts = max(existing, now)
    with open(marker, "a"):
        os.utime(marker, (ts, ts))


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
