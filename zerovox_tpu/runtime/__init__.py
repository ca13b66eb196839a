"""Serving runtime: engine with compile-cache + length bucketing, the
HTTP serving daemon (server.TTSServer), and the programmatic client
(client.TTSClient) — the latter two imported lazily; the server pulls in
the streaming synthesizer, the client only stdlib + numpy."""

from .engine import TTSEngine

__all__ = ["TTSEngine", "TPServingEngine", "TTSServer", "TTSClient"]


def __getattr__(name):
    if name == "TTSServer":
        from .server import TTSServer
        return TTSServer
    if name == "TTSClient":
        from .client import TTSClient
        return TTSClient
    if name == "TPServingEngine":
        from .tp_engine import TPServingEngine
        return TPServingEngine
    raise AttributeError(name)
