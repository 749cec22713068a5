"""Device-mesh construction and multi-host initialization.

The communication backend of the engine (SURVEY.md section 2b): the
reference is single-process with no comm layer at all, so this module is
designed TPU-first rather than ported.  All distributed code in the
package is written against a :class:`jax.sharding.Mesh` with up to three
named axes:

- ``space``: row-sharding of the snapshot matrix (tensor-parallel
  workhorse for the tall-skinny GEMM/QR path); collectives ride ICI.
- ``time``: column-sharding for long time ranges (sequence-parallel
  analogue); the delay-embedding halo exchange and the all-to-all
  reshard live on this axis.
- ``data``: batches of independent decompositions (per-variable /
  per-window fits; data-parallel / expert-parallel analogue).

Axes of size one are always present so sharding specs compose uniformly.
"""

from __future__ import annotations

import math
import os
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_SPACE = "space"
AXIS_TIME = "time"
MESH_AXES = (AXIS_DATA, AXIS_SPACE, AXIS_TIME)


def initialize_distributed() -> None:
    """Initialize multi-host JAX if a coordinator is configured.

    No-op in single-process runs.  Controlled by the standard JAX env
    variables (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers don't need bespoke flags.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def parse_mesh_shape(spec: str | Mapping[str, int] | None) -> dict[str, int] | None:
    """Parse a mesh-shape spec like ``"space=4,time=2"`` into a dict.

    ``None`` / ``"auto"`` return None (meaning: auto layout).
    """
    if spec is None or spec == "auto":
        return None
    if isinstance(spec, Mapping):
        shape = dict(spec)
    else:
        shape = {}
        for part in spec.split(","):
            name, _, value = part.partition("=")
            name = name.strip()
            if name not in MESH_AXES:
                raise ValueError(
                    f"Unknown mesh axis {name!r}; supported axes: {MESH_AXES}"
                )
            shape[name] = int(value)
    for name, size in shape.items():
        if size < 1:
            raise ValueError(f"Mesh axis {name} must be >= 1, got {size}")
    return shape


def make_mesh(
    shape: str | Mapping[str, int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, space, time) mesh over the available devices.

    Auto layout puts every device on the ``space`` axis — the dominant
    axis for the tall-skinny factorizations.  An explicit shape must
    multiply to the device count; unspecified axes default to 1, with the
    ``space`` axis absorbing the remainder.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    parsed = parse_mesh_shape(shape)
    if parsed is None:
        sizes = {AXIS_DATA: 1, AXIS_SPACE: n, AXIS_TIME: 1}
    else:
        sizes = {axis: parsed.get(axis, 0) for axis in MESH_AXES}
        known = math.prod(s for s in sizes.values() if s > 0)
        missing = [axis for axis, s in sizes.items() if s == 0]
        if n % known != 0:
            raise ValueError(
                f"Mesh shape {parsed} incompatible with {n} devices"
            )
        remainder = n // known
        for axis in missing:
            sizes[axis] = 1
        if missing and remainder > 1:
            # absorb the remainder on space if unspecified, else on the
            # first unspecified axis
            target = AXIS_SPACE if AXIS_SPACE in missing else missing[0]
            sizes[target] = remainder
        if math.prod(sizes.values()) != n:
            raise ValueError(
                f"Mesh shape {sizes} does not cover {n} devices"
            )
    grid = np.asarray(devices).reshape(
        sizes[AXIS_DATA], sizes[AXIS_SPACE], sizes[AXIS_TIME]
    )
    return Mesh(grid, MESH_AXES)


def single_device_mesh(device: jax.Device | None = None) -> Mesh:
    device = device or jax.devices()[0]
    return make_mesh(devices=[device])
