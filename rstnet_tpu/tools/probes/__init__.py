"""On-chip micro-probes behind measured design decisions (ARCHITECTURE.md
"Measured-and-rejected" entries). Each is a standalone script, run with
`python -m rstnet_tpu.tools.probes.<name>`; none are imported by the
library. They are kept so a future backend/jaxlib bump can re-run the
experiment instead of trusting a stale conclusion."""
