"""Device mesh construction.

The reference scales by OS processes + ROS topics (SURVEY.md §5); here the
scale-out axes are a ``jax.sharding.Mesh``:

* ``data`` — independent odometry sequences (multi-sequence batch; a degree
  of freedom the CPU reference doesn't have);
* ``map``  — the matching map and correspondence set sharded across chips;
  kNN top-k merges with an all-gather, the 6x6 normal equations with a psum
  (both ride ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, map_: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if map_ is None:
        map_ = n // data
    if data * map_ != n:
        raise ValueError(f"mesh {data}x{map_} != {n} devices")
    arr = np.asarray(devices).reshape(data, map_)
    return Mesh(arr, ("data", "map"))
