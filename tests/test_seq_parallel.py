"""Sequence-parallel sliding+global attention vs the single-device
composite: exact parity on the simulated mesh.

Covers the owed sequence-sharding story (SURVEY.md §2.2): band halo
exchange via ppermute, G-sized psum global gather, cross-device flash
softmax for global rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.ops.seq_attention import (
    sliding_global_attention_seqsharded,
)
from retrieval_augmented_mds_tpu.ops.sliding_attention import (
    sliding_attention_init,
    sliding_global_attention,
)


def _mesh(n_shard):
    from retrieval_augmented_mds_tpu.parallel import MeshSpec

    if len(jax.devices()) < n_shard:
        pytest.skip(f"needs {n_shard} simulated devices")
    return MeshSpec(1, n_shard).build()


def _setup(b=2, t=256, h=32, w=8, seed=0, n_globals=5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    p = sliding_attention_init(jax.random.PRNGKey(seed), h)
    # globals scattered across the whole sequence (several shards)
    gpos = rng.choice(t - 8, size=(b, n_globals), replace=False)
    global_mask = np.zeros((b, t), np.int32)
    for i in range(b):
        global_mask[i, gpos[i]] = 1
        global_mask[i, 0] = 1
    padding_mask = np.ones((b, t), np.int32)
    padding_mask[:, -12:] = 0  # ragged tail on the last shard
    return p, x, jnp.asarray(global_mask), jnp.asarray(padding_mask)


@pytest.mark.slow
def test_seqsharded_matches_single_device():
    mesh = _mesh(8)
    p, x, gm, pm = _setup(t=256, w=8)
    ref = sliding_global_attention(p, x, 4, 8, gm, pm, max_globals=16)
    got = sliding_global_attention_seqsharded(
        p, x, 4, 8, gm, pm, 16, mesh
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_seqsharded_no_globals_beyond_cls():
    mesh = _mesh(8)
    p, x, _, pm = _setup(t=128, w=4, n_globals=1)
    gm = jnp.zeros_like(pm).at[:, 0].set(1)
    ref = sliding_global_attention(p, x, 4, 4, gm, pm, max_globals=8)
    got = sliding_global_attention_seqsharded(p, x, 4, 4, gm, pm, 8, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_seqsharded_grad_parity():
    """Sequence parallelism must preserve gradients (training use)."""
    mesh = _mesh(4)
    p, x, gm, pm = _setup(b=1, t=64, h=16, w=4, n_globals=3)

    def loss_ref(p_, x_):
        return jnp.sum(
            sliding_global_attention(p_, x_, 2, 4, gm, pm, max_globals=8)
            ** 2
        )

    def loss_sp(p_, x_):
        return jnp.sum(
            sliding_global_attention_seqsharded(
                p_, x_, 2, 4, gm, pm, 8, mesh
            )
            ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    g_sp = jax.grad(loss_sp, argnums=(0, 1))(p, x)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)
    ):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-5, atol=5e-5
        )


def test_led_encoder_seqsharded_parity():
    """led_encode(seq_mesh=...) == led_encode() — the full encoder stack
    under jit with the sequence sharded over the mesh."""
    from retrieval_augmented_mds_tpu.models.config import Seq2SeqConfig
    from retrieval_augmented_mds_tpu.models.led import init_led, led_encode

    mesh = _mesh(8)
    cfg = Seq2SeqConfig(
        vocab_size=128, d_model=32, n_heads=4, enc_layers=2, dec_layers=1,
        d_ffn=64, max_src_len=256, max_tgt_len=32, window=8, max_globals=8,
    )
    params = init_led(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(4, 120, (2, 256)), jnp.int32)
    pm = jnp.ones((2, 256), jnp.int32)
    gm = jnp.zeros_like(pm).at[:, 0].set(1).at[:, 100].set(1).at[:, 200].set(1)

    ref = jax.jit(
        lambda p, i: led_encode(p, cfg, i, pm, gm)
    )(params, ids)
    got = jax.jit(
        lambda p, i: led_encode(p, cfg, i, pm, gm, seq_mesh=mesh)
    )(params, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


@pytest.mark.slow
def test_seqsharded_composes_with_data_parallelism():
    """DP x SP on a (2 data, 4 shard) mesh: batch sharded over `data`,
    sequence over `shard` — same numerics as single-device."""
    from retrieval_augmented_mds_tpu.parallel import MeshSpec

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    mesh = MeshSpec(2, 4).build()
    p, x, gm, pm = _setup(b=4, t=128, h=32, w=8, n_globals=3)
    ref = sliding_global_attention(p, x, 4, 8, gm, pm, max_globals=8)
    got = sliding_global_attention_seqsharded(p, x, 4, 8, gm, pm, 8, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
