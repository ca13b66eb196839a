"""zerovox_tpu — a TPU-native realtime text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ishine/zerovox.cpp (FastSpeech2 encoder + variance adaptor, StyleTTS mel
decoder, HiFi-GAN vocoder, GGUF weight ingestion, WAV output) designed for
TPU: channels-last static-shape graphs on the MXU, a single jit-compiled
synthesis pipeline with no host round-trips, sharded batch serving over
device meshes, and streaming chunked vocoding for low-latency TTFA.
"""

__version__ = "0.1.0"

from .config import ZeroVoxConfig, TINY_CONFIG
from .params import init_params, load_params, save_params
from .models.pipeline import synthesize, jit_synthesize, SynthesisResult

__all__ = [
    "ZeroVoxConfig", "TINY_CONFIG",
    "init_params", "load_params", "save_params",
    "synthesize", "jit_synthesize", "SynthesisResult",
]
