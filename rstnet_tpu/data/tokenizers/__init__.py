"""Offline tokenizers: audio -> Mimi codes, text -> word-aligned BPE frames."""

from rstnet_tpu.data.tokenizers.abs_tokenizer import AbsTokenizer

__all__ = ["AbsTokenizer"]
