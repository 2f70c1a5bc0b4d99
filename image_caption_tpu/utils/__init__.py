"""Utilities: IO, torch import, native binding, debug/profiling."""

from .io import load_hkl, load_pickle, save_hkl, save_pickle  # noqa: F401
