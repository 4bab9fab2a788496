"""Checkpoint save/resume with orbax (sharded, async-capable).

Capability parity with the reference's FSDP checkpointing
(``MLLM_v2/utils/train_utils.py:109-195``): full train state (params +
optimizer + step) plus scheduler-free extras (reporter + sampler state),
auto-resume from the latest checkpoint in the experiment dir, keep-last-N
rotation (codec-style ``AudioCodec/.../utils/utils.py:247-258``), and
``save_model`` for weights-only exports. Unlike the reference's rank-0
full-state gather, orbax writes each shard from its owner — no host OOM at
scale.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(path: str | Path) -> Path:
    return Path(path).absolute()


def save_checkpoint(
    path: str | Path,
    state: dict,
    extras: Optional[dict[str, Any]] = None,
    keep_last: Optional[int] = None,
) -> None:
    """Save train state (pytree of arrays) + json-serializable extras."""
    path = _ckpt_dir(path)
    if path.exists():
        # only one process deletes on a shared filesystem, and everyone
        # waits for the deletion before the collective orbax save starts
        if jax.process_index() == 0:
            shutil.rmtree(path, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_rmtree")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state)
    if extras:
        if jax.process_index() == 0:
            with open(path / "extras.json", "w") as fp:
                json.dump(extras, fp)
    logging.info(f"saved checkpoint {path}")
    if keep_last is not None and keep_last > 0:
        rotate_checkpoints(path.parent, keep_last)


def restore_checkpoint(
    path: str | Path, target_state: dict, partial: bool = False
) -> tuple[dict, dict]:
    """Restore into the (sharded) structure of ``target_state``; returns
    (state, extras). ``partial=True`` restores only the subtree present in
    ``target_state`` (e.g. params-only inference loads)."""
    path = _ckpt_dir(path)
    with ocp.StandardCheckpointer() as ckptr:
        if partial:
            full = ckptr.restore(path / "state")
            state = _pick_subtree(full, target_state)
        else:
            state = ckptr.restore(path / "state", target_state)
    extras = {}
    if (path / "extras.json").is_file():
        with open(path / "extras.json") as fp:
            extras = json.load(fp)
    logging.info(f"restored checkpoint {path}")
    return state, extras


def _pick_subtree(full: Any, target: Any) -> Any:
    """Select from ``full`` only the keys present in ``target``."""
    if isinstance(target, dict):
        return {k: _pick_subtree(full[k], v) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return type(target)(_pick_subtree(f, t) for f, t in zip(full, target))
    return full


_CKPT_RE = re.compile(r"ep(\d+)(?:-iter(\d+))?\.checkpoint$")


def scan_checkpoints(exp_dir: str | Path) -> list[Path]:
    """All checkpoints in an experiment dir, oldest first (by epoch/iter)."""
    exp_dir = _ckpt_dir(exp_dir)
    found = []
    for p in exp_dir.glob("*.checkpoint"):
        m = _CKPT_RE.search(p.name)
        if m:
            ep = int(m.group(1))
            it = int(m.group(2)) if m.group(2) else 1 << 30
            found.append(((ep, it), p))
    return [p for _, p in sorted(found)]


def latest_checkpoint(exp_dir: str | Path) -> Optional[Path]:
    ckpts = scan_checkpoints(exp_dir)
    return ckpts[-1] if ckpts else None


def rotate_checkpoints(exp_dir: str | Path, keep_last: int) -> None:
    ckpts = scan_checkpoints(exp_dir)
    for p in ckpts[:-keep_last]:
        logging.info(f"removing old checkpoint {p}")
        shutil.rmtree(p, ignore_errors=True)


def maybe_resume(
    exp_dir: str | Path, target_state: dict
) -> tuple[dict, dict, Optional[Path]]:
    """Auto-resume from the newest checkpoint if one exists
    (``train_utils.py:109-147`` semantics)."""
    ckpt = latest_checkpoint(exp_dir)
    if ckpt is None:
        return target_state, {}, None
    state, extras = restore_checkpoint(ckpt, target_state)
    return state, extras, ckpt


def save_model(path: str | Path, params: dict) -> None:
    """Weights-only export (``train_utils.py:187``)."""
    path = _ckpt_dir(path)
    if path.exists():
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_model(path: str | Path, template: dict) -> dict:
    """Inverse of ``save_model``: restore a weights-only export onto a
    param tree with the same structure (e.g. ``Model.init`` output)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_ckpt_dir(path), template)


def export_numpy(path: str | Path, params: dict) -> None:
    """Flat .npz export for interop/debug."""
    import numpy as np

    from rstnet_tpu.core import flatten_dict

    flat = {k: np.asarray(v) for k, v in flatten_dict(params)}
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    np.savez(path, **flat)
