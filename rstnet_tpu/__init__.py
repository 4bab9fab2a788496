"""RSTnet-TPU: a TPU-native real-time speech-text foundation model toolkit.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of RSTnet
(yangdongchao/RSTnet): streaming Mimi-style audio codec, Moshi-style
RQ-Transformer speech-text LM over pretrained LLM backbones, sharded
training on a TPU mesh, and a jit-compiled real-time generation loop.

Design notes
------------
Instead of the reference's mutable ``StreamingModule`` state protocol
(``MLLM_v2/modules/streaming.py:33-151``), every stateful component here is a
pure function over explicit, fixed-shape state pytrees:

    y            = module(params, x)            # offline
    state        = module.init_state(batch)     # fixed-shape state pytree
    y, new_state = module.step(params, state, x)  # streaming chunk

Fixed shapes make every streaming step jit-compilable once, giving the
XLA equivalent of the reference's CUDA-graph capture for free.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("RSTNET_PLATFORM"):
    # Uniform device-selection escape hatch for every CLI in the package:
    # RSTNET_PLATFORM=cpu keeps data-prep/tokenization jobs off the TPU so
    # they never contend with a training or serving process on the chip.
    # (Set via jax.config, not JAX_PLATFORMS, because site boot hooks that
    # force-register a platform ignore the environment variable.)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["RSTNET_PLATFORM"])
