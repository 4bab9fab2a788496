"""Training losses: per-stream CE with masks/weights, GAN/STFT codec losses."""
