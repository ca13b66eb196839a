"""Serving runtime: engine with compile-cache + length bucketing."""

from .engine import TTSEngine

__all__ = ["TTSEngine"]
