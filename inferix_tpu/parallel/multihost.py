"""Multi-host bring-up: `jax.distributed` + global mesh construction.

The reference initializes torch.distributed from RANK/WORLD_SIZE env vars
(`inferix/distributed/dist_utils.py:50-85` dist_init: NCCL/Gloo process
group, cp*pp == world_size assert, group construction). TPU-native
equivalent: one `jax.distributed.initialize` (coordinator + process id from
the TPU pod metadata or explicit env), then a single global Mesh over
`jax.devices()` — GSPMD handles every collective; there are no per-group
objects to build.

`initialize_multihost()` mirrors dist_init's env-driven contract
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, falling back to JAX's
own auto-detection on TPU pods) and `make_global_mesh` validates the
parallel config against the GLOBAL device count the way dist_init asserts
cp_size*pp_size == world_size.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from ..core.config import ParallelConfig
from .mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` for a multi-process run.

    Resolution order (reference dist_utils reads RANK/WORLD_SIZE the same
    way): explicit args > COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env
    > JAX auto-detection (TPU pod metadata). Returns True when a
    distributed runtime was initialized, False for single-process runs.
    No-ops safely if already initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        raise


def make_global_mesh(cfg: ParallelConfig):
    """Global mesh over every device in the job (all hosts). Mirrors
    dist_init's world-size validation."""
    devices = jax.devices()
    need = cfg.world_size
    if need != len(devices):
        raise ValueError(
            f"parallel config (dp={cfg.dp}, sp={cfg.sp}, tp={cfg.tp}, "
            f"pp={cfg.pp}) needs {need} devices but the job has "
            f"{len(devices)} (processes={jax.process_count()})"
        )
    return make_mesh(cfg, devices=devices)


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0
