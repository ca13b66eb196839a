"""Serving runtime: engine with compile-cache + length bucketing, and the
HTTP serving daemon (server.TTSServer — imported lazily; it pulls in the
streaming synthesizer)."""

from .engine import TTSEngine

__all__ = ["TTSEngine", "TTSServer"]


def __getattr__(name):
    if name == "TTSServer":
        from .server import TTSServer
        return TTSServer
    raise AttributeError(name)
