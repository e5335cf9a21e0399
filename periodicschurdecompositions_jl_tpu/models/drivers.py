"""Public decomposition drivers (stubs are replaced as cores land)."""
from __future__ import annotations


def pschur(*args, **kwargs):
    raise NotImplementedError("pschur core lands in a later commit this round")


def gpschur(*args, **kwargs):
    raise NotImplementedError("gpschur core lands in a later commit this round")


def phessenberg(*args, **kwargs):
    raise NotImplementedError("phessenberg lands in a later commit this round")
