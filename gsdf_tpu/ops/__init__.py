"""Device kernels: marching cubes, pruning, dual contouring."""
