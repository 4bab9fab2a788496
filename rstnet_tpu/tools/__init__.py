"""Data-prep CLI tools (scp split/filter, tokenization, manifests, job fan-out)."""
