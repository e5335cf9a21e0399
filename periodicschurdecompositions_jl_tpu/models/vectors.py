"""Eigenvector extraction (stub; lands after reordering)."""
from __future__ import annotations


def eigvecs(*args, **kwargs):
    raise NotImplementedError("eigvecs lands in a later commit this round")
