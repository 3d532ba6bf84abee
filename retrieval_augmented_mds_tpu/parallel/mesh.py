"""Mesh bootstrap and sharding primitives.

Replaces the reference's distributed substrate (torch.distributed DDP /
DeepSpeed via Lightning "strategies"; SURVEY.md §2.2, L0) with the
single-controller JAX model: one `jax.sharding.Mesh` with two logical axes,

  * ``data``  — batch (data-parallel) axis; gradients reduce with `psum`
                over ICI (replaces NCCL all-reduce),
  * ``shard`` — index/model shard axis; the MIPS embedding matrix lives
                row-sharded along it (replaces the rank-chunked FAISS build
                protocol at sotasum/mips.py:226-244 + barriers at
                sotasum/lightning_model.py:168-180).

The filesystem-as-data-plane protocol of the reference disappears: bulk
data moves over ICI collectives, and "barriers" are just data dependencies
of compiled programs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SHARD_AXIS = "shard"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * shard`` must equal the device count."""

    data: int
    shard: int

    def build(self, devices: Sequence[jax.Device] | None = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        n = self.data * self.shard
        if len(devices) < n:
            raise ValueError(
                f"MeshSpec({self.data},{self.shard}) needs {n} devices, "
                f"have {len(devices)}"
            )
        grid = np.asarray(devices[:n]).reshape(self.data, self.shard)
        return Mesh(grid, (DATA_AXIS, SHARD_AXIS))


def best_mesh(
    n_devices: int | None = None,
    *,
    prefer_shard: int | None = None,
) -> Mesh:
    """Pick a (data, shard) factorization for the available devices.

    Default policy: put everything on ``shard`` for index-dominated work
    only when asked; otherwise balance — shard gets the largest power of two
    ≤ sqrt(n), data gets the rest. Single device → (1, 1) mesh, so all code
    paths are mesh-agnostic.
    """
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if prefer_shard is not None:
        if n % prefer_shard:
            raise ValueError(f"{n} devices not divisible by shard={prefer_shard}")
        return MeshSpec(n // prefer_shard, prefer_shard).build(devices)
    shard = 1
    while shard * 2 <= max(1, int(n**0.5)) and n % (shard * 2) == 0:
        shard *= 2
    return MeshSpec(n // shard, shard).build(devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-leading sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_index_rows(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Row sharding over the shard axis (embedding matrices: [N, D])."""
    return NamedSharding(mesh, P(SHARD_AXIS, *([None] * (ndim - 1))))


def with_mesh(mesh: Mesh, fn):
    """Run ``fn`` under the mesh context (for `pjit`-style code)."""

    @functools.wraps(fn)
    def wrapped(*a: Any, **k: Any):
        with mesh:
            return fn(*a, **k)

    return wrapped


def host_staging(x: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Stage a host array onto the mesh with the given sharding.

    Uses `jax.device_put` which performs per-device slicing on host and
    parallel H2D transfers — the replacement for the reference's
    Arrow-shard-per-rank filesystem staging (sotasum/mips.py:243-244).
    """
    return jax.device_put(x, sharding)


def local_device_count() -> int:
    return jax.local_device_count()
