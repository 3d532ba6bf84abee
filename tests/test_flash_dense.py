"""Parity tests for the dense decoder flash kernel (ops/flash_dense.py).

The XLA composite `_dense_xla` is the correctness oracle (same math as
models/core.py attention); the Pallas kernels run in interpret mode on
the forced-CPU test backend. Covers: padded cross-attention, causal
self-attention, multi-q-block grids (the bwd dK/dV accumulation), the
custom_vjp gradients, and `attention_train` ≡ `attention` equivalence
(the led_decode training-path rewrite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_augmented_mds_tpu.models.core import (
    attention,
    attention_train,
    causal_mask,
    mha_init,
)
from retrieval_augmented_mds_tpu.ops.flash_dense import (
    _dense_xla,
    _q_block,
    dense_rows,
    flash_dense_attention,
    flash_dense_backward,
    flash_dense_blocked,
    flash_dense_blocked_backward,
)


def _setup(b=2, nh=2, t=16, s=128, dh=8, seed=0, pad=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, nh, t, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, nh, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, nh, s, dh), jnp.float32)
    if pad:
        n_valid = jnp.arange(b) * (s // 4) + s // 2
        kb = jnp.where(jnp.arange(s)[None, :] < n_valid[:, None], 0.0, -1e9)
    else:
        kb = jnp.zeros((b, s), jnp.float32)
    return q, k, v, kb.astype(jnp.float32)


@pytest.mark.parametrize("causal,t,s", [
    (False, 16, 128),   # padded cross-attention
    (True, 16, 16),     # causal self-attention
    (False, 512, 128),  # multi-q-block grid (nq = 2)
    (True, 512, 512),   # causal, multi-q-block
])
def test_fwd_matches_oracle(causal, t, s):
    q, k, v, kb = _setup(t=t, s=s, pad=not causal)
    got = flash_dense_attention(q, k, v, kb, causal=causal, interpret=True)
    want = _dense_xla(q, k, v, kb, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal,t,s", [
    (False, 16, 128),
    (True, 16, 16),
    (False, 512, 128),  # exercises the dK/dV VMEM accumulation (nq = 2)
])
def test_bwd_matches_oracle(causal, t, s):
    q, k, v, kb = _setup(t=t, s=s, pad=not causal)
    g = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32)
    dq, dk, dv = flash_dense_backward(q, k, v, kb, g, causal=causal,
                                      interpret=True)
    _, vjp = jax.vjp(lambda a, b_, c: _dense_xla(a, b_, c, kb, causal),
                     q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=2e-4, atol=2e-4)


def test_dense_rows_grads_finite():
    q, k, v, kb = _setup()

    def loss(q_, k_, v_):
        return jnp.sum(dense_rows(q_, k_, v_, kb, False) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gr in grads:
        assert bool(jnp.isfinite(gr).all())


def test_attention_train_matches_attention_cross():
    """attention_train(key_padding_mask) ≡ attention(mask) — the
    led_decode cross-attention rewrite (models/led.py layer_fn)."""
    p = mha_init(jax.random.PRNGKey(0), 16)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x_q = jax.random.normal(ks[0], (2, 6, 16), jnp.float32)
    x_kv = jax.random.normal(ks[1], (2, 10, 16), jnp.float32)
    kpm = (jnp.arange(10)[None, :] < jnp.asarray([7, 10])[:, None]).astype(
        jnp.int32
    )
    got = attention_train(p, x_q, x_kv, 2, key_padding_mask=kpm)
    want, _ = attention(p, x_q, x_kv, 2, mask=(kpm > 0)[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_attention_train_matches_attention_causal():
    """attention_train(causal=True) ≡ attention(causal_mask) — the
    led_decode self-attention rewrite."""
    p = mha_init(jax.random.PRNGKey(2), 16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16), jnp.float32)
    got = attention_train(p, x, x, 2, causal=True)
    want, _ = attention(p, x, x, 2, mask=causal_mask(6, 6, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_q_block():
    assert _q_block(256) == 256
    assert _q_block(512) == 256
    assert _q_block(24) == 8
    assert _q_block(1) == 0
    assert _q_block(7) == 0


# ---------------------------------------------------------------------------
# blocked (long-S) variant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal,t,s", [
    (False, 32, 384),   # nk = 3: exercises the online-softmax carry
    (True, 384, 384),   # causal, nq = nk = 3
])
def test_blocked_fwd_matches_oracle(causal, t, s):
    q, k, v, kb = _setup(t=t, s=s, pad=not causal)
    got, lse = flash_dense_blocked(q, k, v, kb, causal=causal,
                                   interpret=True)
    want = _dense_xla(q, k, v, kb, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # lse parity vs direct logsumexp of the masked logits
    b, nh, _, dh = q.shape
    scale = 1.0 / np.sqrt(dh)
    logits = np.einsum(
        "bhqd,bhkd->bhqk", np.asarray(q) * scale, np.asarray(k)
    ) + np.asarray(kb)[:, None, None, :]
    if causal:
        qi = np.arange(t)[:, None]
        ki = np.arange(s)[None, :]
        logits = np.where((ki <= qi)[None, None], logits, -1e9)
    ref_lse = np.log(np.sum(np.exp(
        logits - logits.max(-1, keepdims=True)
    ), -1)) + logits.max(-1)
    np.testing.assert_allclose(
        np.asarray(lse).reshape(b, nh, t), ref_lse, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("merged", [True, False])
@pytest.mark.parametrize("causal,t,s", [
    (False, 32, 384),
    (True, 384, 384),
])
def test_blocked_bwd_matches_oracle(causal, t, s, merged):
    q, k, v, kb = _setup(t=t, s=s, pad=not causal)
    out, lse = flash_dense_blocked(q, k, v, kb, causal=causal,
                                   interpret=True)
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)
    dq, dk, dv = flash_dense_blocked_backward(
        q, k, v, kb, out, lse, g, causal=causal, interpret=True,
        merged=merged,
    )
    _, vjp = jax.vjp(lambda a, b_, c: _dense_xla(a, b_, c, kb, causal),
                     q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=2e-4, atol=2e-4)


def test_k_block():
    from retrieval_augmented_mds_tpu.ops.flash_dense import _k_block

    assert _k_block(8192) == 512
    assert _k_block(384) == 128
    assert _k_block(100) == 0
