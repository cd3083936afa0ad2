"""Multi-host runtime scaffolding (SURVEY §2.3 / §5).

The reference is a single-process program; this module is the
``jax.distributed`` entry path for running the sharded SLAM engine across
hosts: process 0 drives the frame loop (odometry is latency-bound and
pinned there — the sharded tracker replicates its dense iterations so
every process computes the identical pose), and the spatially sharded map
spans all hosts' devices through the same ``jax.sharding.Mesh`` — XLA
routes intra-host combines over ICI and cross-host combines over DCN.

Degenerate single-host operation is the default: with no coordinator
configured, ``initialize()`` is a no-op and the mesh covers the local
devices only, so every code path here is exercised by the CPU-mesh tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax


@dataclass
class DistributedContext:
    initialized: bool
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_index == 0


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> DistributedContext:
    """Join (or skip) the multi-host runtime.

    Explicit arguments win; otherwise the standard environment variables
    are honored (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID`` — and on TPU pods jax.distributed auto-discovers
    from the TPU metadata, so ``initialize()`` with no configuration at
    all still does the right thing there). With neither present this is a
    no-op single-process context.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)

    initialized = False
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        initialized = True

    return DistributedContext(
        initialized=initialized,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


def shutdown():
    """Leave the multi-host runtime (no-op when never initialized)."""
    try:
        jax.distributed.shutdown()
    except (RuntimeError, ValueError):
        pass


def run_sharded_slam(cfg, scans, imu_windows, n_devices=None,
                     seed_pose=None):
    """Convenience multi-host driver: every process constructs the same
    ShardedSlamSystem over the GLOBAL device mesh and feeds it the same
    frames (SPMD — each jitted call executes collectively; per-host input
    arrays are identical replicas). Returns (odom_poses, system) on every
    process."""
    from .slam_sharded import ShardedSlamSystem

    system = ShardedSlamSystem(
        cfg, n_devices=n_devices, total_frames=len(scans) + 4
    )
    if seed_pose is not None:
        rot, pos, vel = seed_pose
        system.tracker.x.rot = rot.copy()
        system.tracker.x.pos = pos.copy()
        if vel is not None:
            system.tracker.x.vel = vel.copy()
    for i, scan in enumerate(scans):
        system.process_frame(i, scan, imu_windows[i])
    return system.odom_poses[: len(scans)], system
