"""sys.path hygiene for parity tests that import the PyTorch reference.

Several reference trees expose colliding top-level names: the MLLM_v2 root
has ``utils``/``models``/``modules``/``moshi``/``tools`` packages, while the
GLM4V tokenizer root has its own ``utils.py``. Tests that run in the same
process (pytest-xdist groups whole files per worker) would otherwise see
whichever tree a *previous* test imported first — e.g. ``from
utils.dataloader import ...`` resolving against GLM4V's ``utils.py`` and
failing with an order-dependent ImportError.

Call :func:`ensure_reference_root` immediately before importing from a
reference tree: it puts the wanted root at the front of ``sys.path`` and
evicts cached modules under the given top-level names that resolve
elsewhere, so the subsequent import re-resolves against the wanted tree.
"""

import importlib.machinery
import sys
import types

MLLM_V2_ROOT = "/root/reference/MLLM_v2"

#: generic top-level names the MLLM_v2 reference root exposes
MLLM_V2_NAMES = ("utils", "models", "modules", "moshi", "tools", "trainer")


def ensure_reference_root(root: str, names=MLLM_V2_NAMES) -> None:
    """Front `root` on sys.path and purge stale imports of `names`.

    A cached module whose ``__file__`` lives under `root` is kept (re-import
    stays cheap); anything else under those top-level names is evicted so
    the next import resolves against `root`.
    """
    if root in sys.path:
        sys.path.remove(root)
    sys.path.insert(0, root)
    prefix = root.rstrip("/") + "/"
    for mod in list(sys.modules):
        if mod.split(".", 1)[0] not in names:
            continue
        f = getattr(sys.modules[mod], "__file__", None) or ""
        if not f.startswith(prefix):
            del sys.modules[mod]


def stub_module(name: str, **attrs) -> types.ModuleType:
    """Install — or augment — a stub for an optional dependency.

    Different test files stub the same absent packages (``omegaconf``,
    ``torchaudio``, ...) with different attribute subsets; whichever file
    ran first in a shared worker process used to win, breaking the other
    with an order-dependent ImportError. This helper is cumulative: it
    creates the stub once (with a real ModuleSpec so availability probes
    like ``importlib.util.find_spec`` keep working) and adds any missing
    attributes to an existing stub or real module without overwriting.
    """
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = mod
    for key, value in attrs.items():
        if not hasattr(mod, key):
            setattr(mod, key, value)
    return mod
