"""Model stages: FastSpeech2 encoder, StyleTTS decoder, HiFi-GAN vocoder."""

from . import fs2_encoder, styletts_decoder, hifigan, pipeline
from .pipeline import synthesize, jit_synthesize, SynthesisResult, cast_params

__all__ = ["fs2_encoder", "styletts_decoder", "hifigan", "pipeline",
           "synthesize", "jit_synthesize", "SynthesisResult", "cast_params"]
