"""clid_slam_tpu — a TPU-native LiDAR-inertial neural-implicit dense SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DUTRobot/CLID-SLAM (reference layout surveyed in SURVEY.md):

- ``models.neural_map``   — fixed-capacity voxel-hashed neural point map
  (reference: model/neural_points.py) as an immutable pytree updated under jit.
- ``models.decoder``      — shared SDF decoder MLP (reference: model/decoder.py).
- ``models.local_map``    — raw-point local map + region-specific SDF labels
  (reference: model/local_point_cloud_map.py).
- ``odometry.iekf``       — 18-state iterated error-state EKF
  (reference: utils/error_state_iekf.py) with device-side measurement
  reduction and float64 host-side filter algebra.
- ``mapping``             — ray sampler, replay pool ring buffer, map optimizer
  (reference: utils/data_sampler.py, utils/mapper.py).
- ``ops``                 — voxel hashing, kNN search, plane fitting, marching
  cubes (XLA-composed kernels; see ops/ for per-op docs).
- ``pipeline``            — dataset frontend + per-frame SLAM orchestration
  (reference: utils/slam_dataset.py, slam.py).
- ``parallel``            — jax.sharding device-mesh utilities: data-parallel
  mapping, sharded batch pipelines (the reference is single-GPU only).
"""

__version__ = "0.1.0"
