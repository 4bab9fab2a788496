"""Low-level TPU-friendly ops: streaming convolutions, attention, RoPE,
norms, gating FFNs, sampling, and Pallas kernels for the hot paths."""
