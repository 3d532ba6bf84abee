"""Multi-chip contracts: the driver's dry run executed as a test."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_sharding_specs_cover_state():
    from retrieval_augmented_mds_tpu.parallel import (
        MeshSpec,
        zero_sharding_for_tree,
    )
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = MeshSpec(4, 2).build()
    tree = {
        "w": jax.numpy.zeros((16, 8)),
        "b": jax.numpy.zeros((3,)),  # not divisible by 4 → replicated
    }
    specs = zero_sharding_for_tree(tree, mesh)
    assert specs["w"].spec == P("data", None)
    assert specs["b"].spec == P()
