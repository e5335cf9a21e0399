"""Eigenvalue reordering (stub; lands with the swap engine)."""
from __future__ import annotations


def ordschur(*args, **kwargs):
    raise NotImplementedError("ordschur lands in a later commit this round")
