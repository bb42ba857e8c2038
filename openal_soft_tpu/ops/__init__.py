"""Device kernels, resampler/filter table generation, and the numpy spec oracle."""
