"""liodom_tpu — a TPU-native LiDAR odometry and mapping engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LiODOM
(emiliofidalgo/liodom, RAS 2022): LiDAR-only pose estimation that minimises a
loss over distance-weighted edge-to-line correspondences against a local map,
plus a hash-based voxel-grid global map with adaptive local mapping.

Unlike the reference (C++/ROS, threads + mutex queues + KdTreeFLANN + Ceres),
this engine is built TPU-first:

* scans live as fixed-shape padded range tensors ``(rings, width, 3)`` + masks;
* feature extraction (ring routing, 11-tap smoothness, region-wise edge
  selection with neighbour suppression) is fully vectorised / Pallas;
* correspondence search is an exact brute-force kNN kernel (MXU + running
  top-k) instead of a per-frame KdTree rebuild;
* the pose solve is a Huber-weighted Levenberg-Marquardt on the SE(3) tangent
  with analytic normal equations (a 6x6 psum-reducible reduction);
* the global map is a device-resident open-addressing voxel-hash;
* scale-out is SPMD over a ``jax.sharding.Mesh`` (data x map axes) rather than
  processes + ROS topics.
"""

from liodom_tpu.core.config import LiodomConfig, MapConfig
from liodom_tpu.core import pose as se3

__version__ = "0.1.0"

__all__ = ["LiodomConfig", "MapConfig", "se3", "__version__"]
