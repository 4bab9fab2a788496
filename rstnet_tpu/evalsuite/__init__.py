"""Codec/LM evaluation suite (parity: ``Evaluation/codec/`` 8-metric CLIs)."""
