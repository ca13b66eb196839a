"""Device-mesh construction.

The reference's only scale-out mechanisms are a CPU threadpool, a dormant
multi-backend graph splitter and a dormant TCP offload backend (SURVEY §2d);
none map to TPU.  The TPU-native replacement is a jax.sharding.Mesh with
named axes and GSPMD-partitioned programs:

  "data"  — batch data-parallelism (utterances)
  "model" — tensor-parallel channel sharding of the wide matmuls/convs
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh.  Defaults to all devices on the data axis.

    On multi-host slices the device order from jax.devices() already follows
    the physical torus; for a single host any order rides ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def parse_mesh_spec(spec: str) -> Tuple[int, int]:
    """Parse a CLI "DATA,MODEL" mesh string -> (data, model).

    Shared by the serving and training CLIs so the syntax and error text
    cannot drift.  Raises ValueError with a user-facing message.
    """
    try:
        d, m = (int(x) for x in spec.split(","))
    except ValueError:
        raise ValueError(f"--mesh {spec!r} is not DATA,MODEL "
                         "(two comma-separated ints, e.g. --mesh 4,2)")
    if d < 1 or m < 1:
        raise ValueError(f"--mesh {spec!r}: axis sizes must be >= 1")
    return d, m
