"""Device-side ops: masks, losses, and Pallas kernels."""
