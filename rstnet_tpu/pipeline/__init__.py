"""In-the-wild data pipeline (parity: DataPipeline/ + egs emilia pipeline)."""
