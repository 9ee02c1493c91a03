"""fl_slam_tpu — TPU-native Geometric Compositional SLAM.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
GC-SLAM v2 system (whabacivch/FL-SLAM): a strict, branch-free, fixed-cost,
information-geometric LiDAR+IMU+odometry+RGB-D SLAM backend.

Architecture (TPU-first, NOT a port):
  - The entire per-scan update is one pure function ``scan_step(carry, inputs)``
    compiled once and driven by ``jax.lax.scan`` over pre-staged sensor tensors
    (reference runs a ROS multi-process graph; see SURVEY.md §7.1).
  - The map is a fixed-capacity device-resident array atlas updated with masked
    scatter ops (reference: host-side dict-of-tiles with Python loops,
    ``backend/pipeline.py:1272-1447``).
  - Hypotheses are a vmap axis; batched replay shards instances over a device
    mesh with ``shard_map``.
  - Certificates are dictionaries of device scalars (static keys), never
    host-synced inside the loop (reference pulls ``float()`` per scan).

Numerics: x64 is enabled globally (the reference core is float64,
``common/jax_init.py:24-32``); all hot-path arrays carry an explicit dtype from
``GCConfig.dtype`` so TPU runs use float32/bfloat16 where profitable.
"""

from fl_slam_tpu import runtime as _runtime  # noqa: F401  (x64 init side effect)

__version__ = "0.1.0"
