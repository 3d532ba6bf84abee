"""Fused flash backward kernels vs autodiff of the XLA composite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.ops.flash_sliding import (
    _local_rows_xla,
    flash_sliding_attention,
)
from retrieval_augmented_mds_tpu.ops.flash_sliding_bwd import (
    flash_sliding_backward,
)


# t=256 (nb=2) covers the edge blocks; t=512 (nb=4) adds interior
# blocks where BOTH one-step carries of the merged kernel are live;
# w=64 exercises a sub-128 window riding a 128-lane tile (block_for)
@pytest.mark.parametrize("t,w", [(256, 128), (512, 128), (256, 64),
                                 (768, 192)])
def test_backward_kernels_match_autodiff(t, w):
    key = jax.random.PRNGKey(0)
    b, nh, dh, g = 2, 2, 32, 3
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (b, nh, t, dh))
    k = jax.random.normal(ks[1], (b, nh, t, dh))
    v = jax.random.normal(ks[2], (b, nh, t, dh))
    kg = jax.random.normal(ks[3], (b, nh, g, dh))
    vg = jax.random.normal(ks[4], (b, nh, g, dh))
    key_bias = jnp.where(
        jax.random.bernoulli(ks[5], 0.9, (b, t)), 0.0, -1e9
    ).astype(jnp.float32)
    g_bias = jnp.where(
        jax.random.bernoulli(ks[6], 0.8, (b, g)), 0.0, -1e9
    ).astype(jnp.float32)
    do = jax.random.normal(ks[7], (b, nh, t, dh))
    # zero upstream grads on masked query rows (the caller does this)
    do = do * (key_bias == 0.0).astype(do.dtype)[:, None, :, None]

    _, vjp = jax.vjp(
        lambda q, k, v, kg, vg: _local_rows_xla(
            q, k, v, key_bias, kg, vg, g_bias, w
        ),
        q, k, v, kg, vg,
    )
    rq, rk, rv, rkg, rvg = vjp(do)

    # the production path: forward saves (m, l); delta = rowsum(do*out)
    out, m, l = flash_sliding_attention(
        q, k, v, key_bias, kg, vg, g_bias, window=w, interpret=True,
        return_stats=True,
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(b * nh, 1, t)
    dq, dk, dv, dkg, dvg = flash_sliding_backward(
        q, k, v, key_bias, kg, vg, g_bias, do, m, l, delta, window=w,
        interpret=True,
    )

    for name, got, ref in [
        ("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv),
        ("dkg", dkg, rkg), ("dvg", dvg, rvg),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )


def test_backward_fully_masked_batch_is_finite():
    """Degenerate rows (every key AND every global masked) are
    unreachable in production — LED always has >=1 valid global token
    and downstream masks zero pad-row outputs — and there the kernel's
    uniform-softmax support (3w + G_PAD padded lanes) legitimately
    differs from the composite's (3w + g), in forward and backward
    alike. What MUST hold: the degenerate batch produces finite grads
    (the m=-1e9 regime that forbids folding m and l into one LSE), and
    the normal batch stays exact."""
    key = jax.random.PRNGKey(42)
    b, nh, t, dh, w, g = 2, 2, 256, 32, 128, 3
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, nh, t, dh))
    k = jax.random.normal(ks[1], (b, nh, t, dh))
    v = jax.random.normal(ks[2], (b, nh, t, dh))
    kg = jax.random.normal(ks[3], (b, nh, g, dh))
    vg = jax.random.normal(ks[4], (b, nh, g, dh))
    # batch 0: everything masked; batch 1: normal
    key_bias = jnp.stack(
        [jnp.full((t,), -1e9), jnp.zeros((t,))]
    ).astype(jnp.float32)
    g_bias = jnp.stack(
        [jnp.full((g,), -1e9), jnp.zeros((g,))]
    ).astype(jnp.float32)
    do = jax.random.normal(ks[5], (b, nh, t, dh))

    _, vjp = jax.vjp(
        lambda q, k, v, kg, vg: _local_rows_xla(
            q, k, v, key_bias, kg, vg, g_bias, w
        ),
        q, k, v, kg, vg,
    )
    refs = vjp(do)

    out, m, l = flash_sliding_attention(
        q, k, v, key_bias, kg, vg, g_bias, window=w, interpret=True,
        return_stats=True,
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(b * nh, 1, t)
    got = flash_sliding_backward(
        q, k, v, key_bias, kg, vg, g_bias, do, m, l, delta, window=w,
        interpret=True,
    )
    for name, gv, rv in zip(["dq", "dk", "dv", "dkg", "dvg"], got, refs):
        gv, rv = np.asarray(gv), np.asarray(rv)
        assert np.isfinite(gv).all(), name
        np.testing.assert_allclose(  # batch 1 (normal rows): exact
            gv[1], rv[1], rtol=2e-3, atol=2e-3, err_msg=name,
        )
