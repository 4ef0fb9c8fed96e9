"""Device compute kernels (JAX/XLA/Pallas) and their numpy references."""
