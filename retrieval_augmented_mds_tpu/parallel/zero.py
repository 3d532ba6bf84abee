"""ZeRO-style optimizer-state sharding via sharding specs.

The reference reaches for DeepSpeed ZeRO stage-2 with CPU optimizer offload
(sotasum/pretrain.py:605-614, DeepSpeedCPUAdam at sotasum/lightning_model.py:16)
because GPU HBM cannot hold Adam moments for LED-large. On TPU the same
effect is a *sharding annotation*: first/second Adam moments are sharded
along the ``data`` axis, and XLA inserts the reduce-scatter / all-gather
pattern automatically from the sharding constraints. No host offload, no
custom C++ optimizer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _spec_for_array(shape: tuple[int, ...], n_shards: int) -> P:
    """Shard the largest divisible axis over ``data``; replicate otherwise."""
    if not shape or n_shards <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % n_shards == 0 and shape[ax] >= n_shards:
            spec = [None] * len(shape)
            spec[ax] = DATA_AXIS
            return P(*spec)
    return P()


def zero_sharding_for_tree(tree, mesh: Mesh):
    """Build a pytree of NamedShardings that shards every leaf's largest
    divisible axis across the ``data`` axis (ZeRO-2 analog for optimizer
    moments; apply to the optax state pytree)."""
    n_shards = int(np.prod([mesh.shape[DATA_AXIS]]))

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for_array(tuple(shape), n_shards))

    return jax.tree_util.tree_map(leaf_sharding, tree)
