"""Ray Data stage kernels: stateless map_batches fns + actor-pool classes."""
