"""High-level drivers: decomposition entry points, reordering, eigenvectors, Krylov."""
