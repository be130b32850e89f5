"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md section 2.7).  This framework
scales the backend across hosts by sharding the observation axis of the
BA over all devices of a pod slice: intra-host reduction rides ICI, the
cross-host part of the psum rides DCN -- both are the same
``jax.lax.psum`` in ``parallel/dist_lm.py``.

On a real multi-host slice, call ``initialize()`` early in every process
(reads the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID env or explicit args), then build the mesh with
``observation_mesh()``.  On a single host this degrades gracefully to the
local-device mesh, which is how the test suite (8 virtual CPU devices)
and the driver's dryrun exercise the identical code path.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .dist_lm import AXIS


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True if distributed mode is active.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def observation_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (global) devices for observation sharding."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))
