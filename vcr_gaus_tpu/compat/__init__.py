"""Compatibility layers for upstream-3DGS tooling conventions."""
