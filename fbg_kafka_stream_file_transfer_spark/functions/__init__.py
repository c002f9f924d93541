"""Scalar function library — all Catalyst-native column expressions."""

from . import derivations, text, vectors  # noqa: F401
