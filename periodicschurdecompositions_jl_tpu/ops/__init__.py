"""Kernel layer: rotation/reflector generation and masked slab application.

These are the L0 element kernels of SURVEY.md §1 (reference:
src/householder.jl, src/rschur2x2.jl), re-expressed as branchless,
statically shaped JAX functions that are jit/vmap-safe.
"""
