"""Composed NN blocks: streaming transformer, SEANet codec nets, resamplers."""
