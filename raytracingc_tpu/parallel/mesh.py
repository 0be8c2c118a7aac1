"""Device-mesh construction and multi-host bring-up.

The reference's only "backend" is pthread fork/join in one address space
(``main.c:285-302``). The TPU-native replacement is a named device mesh:

* ``px`` — the image/pixel axis (the analog of the reference's row-cyclic
  thread decomposition, ``main.c:84``). Sharding rays over ``px`` needs no
  communication during tracing; only the final image assembly (and, when
  training, gradient ``pmean``) touches ICI.
* ``spp`` — the sample axis (the analog of the 4000-iteration accumulation
  loop, ``main.c:98-99``): each device traces a disjoint slice of sample ids
  and the per-device means are ``pmean``-combined.

Multi-host pods call :func:`initialize_distributed` once per process before
any jax usage; afterwards ``jax.devices()`` spans the whole slice and the same
mesh code works unchanged (collectives ride ICI inside a slice, DCN only for
host orchestration).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with auto-detect.

    On Cloud TPU all three arguments can be ``None`` (the runtime discovers
    them from the metadata server). Safe to call on a single host — it is a
    no-op when there is nothing to coordinate.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    px: int | None = None,
    spp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(px, spp)`` mesh over the available devices.

    ``px=None`` takes every device not consumed by ``spp``. The defaults give
    a 1-D pixel mesh over all chips — the pure image-space decomposition.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if px is None:
        assert n % spp == 0, f"{n} devices not divisible by spp={spp}"
        px = n // spp
    assert px * spp <= n, f"mesh {px}x{spp} exceeds {n} devices"
    grid = np.asarray(devices[: px * spp]).reshape(px, spp)
    return Mesh(grid, axis_names=("px", "spp"))
