"""TPU-native op library (the replacement for ggml's kernel layer)."""

from .conv import conv1d, conv_transpose1d, linear
from .norm import layer_norm, instance_norm
from .attention import multi_head_attention
from .length_regulator import length_regulate, durations_from_log
from .misc import bucketize, leaky_relu, sinusoid_encoding_table

__all__ = [
    "conv1d", "conv_transpose1d", "linear",
    "layer_norm", "instance_norm",
    "multi_head_attention",
    "length_regulate", "durations_from_log",
    "bucketize", "leaky_relu", "sinusoid_encoding_table",
]
