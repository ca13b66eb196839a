"""Checkpoint + audio I/O."""

from .gguf import GGUFReader, GGUFWriter, GGMLType, GGUFValueType

__all__ = ["GGUFReader", "GGUFWriter", "GGMLType", "GGUFValueType"]
