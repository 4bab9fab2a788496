"""Residual vector quantization: inference codebooks + EMA training updates."""

from rstnet_tpu.quantization.base import DummyQuantizer, QuantizedResult
from rstnet_tpu.quantization.codebook import EuclideanCodebook
from rstnet_tpu.quantization.rvq import (
    ResidualVectorQuantizer,
    SplitResidualVectorQuantizer,
)

__all__ = [
    "DummyQuantizer",
    "EuclideanCodebook",
    "QuantizedResult",
    "ResidualVectorQuantizer",
    "SplitResidualVectorQuantizer",
]
