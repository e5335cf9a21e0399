"""Periodic Krylov-Schur (stub; lands after the dense cores)."""
from __future__ import annotations


class ArnoldiHistory:
    pass


def partial_pschur(*args, **kwargs):
    raise NotImplementedError("partial_pschur lands in a later commit this round")
