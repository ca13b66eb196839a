"""Device-mesh parallelism: DP batch sharding + TP channel sharding (GSPMD)."""

from .mesh import (make_mesh, single_device_mesh, parse_mesh_spec,
                   DATA_AXIS, MODEL_AXIS)
from .sharding import (param_partition_specs, replicated_specs, shard_params,
                       shard_batch, batch_specs)
from .infer import make_sharded_synthesize
from .pipeline import PipelinedTTS
from .seq import TimeParallelVocoder
from .distributed import initialize_distributed, make_pod_mesh

__all__ = ["make_mesh", "single_device_mesh", "parse_mesh_spec",
           "DATA_AXIS", "MODEL_AXIS",
           "param_partition_specs", "replicated_specs", "shard_params",
           "shard_batch", "batch_specs", "make_sharded_synthesize",
           "PipelinedTTS", "TimeParallelVocoder",
           "initialize_distributed", "make_pod_mesh"]
