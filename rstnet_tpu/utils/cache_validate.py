"""Sacrificial deserializer for persistent compile-cache entries.

Run as a standalone script by ``jax_cache._validate_shared_tier``:

    python cache_validate.py TIER LISTFILE PROGRESSFILE STARTIDX

Deserializes every listed entry with this host's XLA:CPU backend. Before
each attempt it writes ``"<index> <name>"`` to PROGRESSFILE (fsync'd), so
the parent can identify — and evict — the entry whose AOT load segfaulted
this process. Entries that fail with clean Python exceptions (truncated
file, format mismatch) are evicted here directly. Exits 0 when the whole
list has been processed.

Deliberately standalone (no rstnet_tpu imports): the parent launches it by
file path with a minimal environment.
"""

import os
import sys


def main(argv: list[str]) -> int:
    tier, listfile, progressfile, start = (
        argv[0], argv[1], argv[2], int(argv[3]),
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.compilation_cache as cc
    from jax._src import xla_bridge
    from jax._src.lib import xla_client

    backend = xla_bridge.get_backend("cpu")
    devices = backend.devices()

    with open(listfile) as f:
        entries = [ln.strip() for ln in f if ln.strip()]

    prog = open(progressfile, "w")
    for i in range(start, len(entries)):
        name = entries[i]
        prog.seek(0)
        prog.truncate()
        prog.write(f"{i} {name}")
        prog.flush()
        os.fsync(prog.fileno())
        path = os.path.join(tier, name)
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            continue  # already evicted / concurrently removed
        try:
            raw = cc.decompress_executable(data)
            serialized, _ = cc.extract_executable_and_time(raw)
            backend.deserialize_executable(
                serialized, devices, xla_client.CompileOptions()
            )
        except Exception:
            # clean failure: jax would recover, but the entry is useless on
            # this host — evict it so reads stop paying for it
            try:
                os.unlink(path)
            except OSError:
                pass
    prog.close()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
