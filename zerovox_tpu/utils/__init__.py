"""Utilities: debug capture, profiling, checkpoint conversion."""

from .debug import tap, capture_run, summarize, print_taps
from .profiling import device_time, trace, StageTimer
from .convert import convert_checkpoint, convert_state_dict, fold_weight_norm
from .compile_cache import enable_compile_cache

__all__ = ["tap", "capture_run", "summarize", "print_taps",
           "device_time", "trace", "StageTimer",
           "convert_checkpoint", "convert_state_dict", "fold_weight_norm",
           "enable_compile_cache"]
