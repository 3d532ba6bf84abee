"""Sliding+global attention vs dense reference; LED decode cache parity."""

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_augmented_mds_tpu.models import EncoderConfig, Seq2SeqConfig
from retrieval_augmented_mds_tpu.models.core import NEG_INF, dense, _split_heads, _merge_heads
from retrieval_augmented_mds_tpu.models.led import (
    init_decode_caches,
    init_led,
    led_decode,
    led_encode,
    led_lm_logits,
)
from retrieval_augmented_mds_tpu.models.longformer import (
    init_longformer,
    longformer_encode,
)
from retrieval_augmented_mds_tpu.ops.sliding_attention import (
    sliding_attention_init,
    sliding_global_attention,
)


def _dense_reference(p, x, n_heads, window, global_mask, padding_mask):
    """O(T²) reference with identical semantics (band ∪ global columns in
    one softmax; global rows = full attention with the *_global weights)."""
    b, t, h = x.shape
    dh = h // n_heads
    scale = 1.0 / np.sqrt(dh)
    q = _split_heads(dense(p["q"], x), n_heads)
    k = _split_heads(dense(p["k"], x), n_heads)
    v = _split_heads(dense(p["v"], x), n_heads)
    kg = k  # HF: global columns for local rows use the regular k/v
    vg = v
    kg_full = _split_heads(dense(p["kg"], x), n_heads)
    vg_full = _split_heads(dense(p["vg"], x), n_heads)
    qg = _split_heads(dense(p["qg"], x), n_heads)

    pos = np.arange(t)
    band = np.abs(pos[:, None] - pos[None, :]) <= window  # [T, T]
    gm = np.asarray(global_mask) > 0
    pm = np.asarray(padding_mask) > 0

    out = np.zeros((b, n_heads, t, dh), np.float32)
    for bi in range(b):
        for hi in range(n_heads):
            # local rows
            logits_local = np.asarray(
                q[bi, hi] @ k[bi, hi].T
            ) * scale  # [T, T]
            keep_local = band & pm[bi][None, :] & (~gm[bi][None, :])
            logits_global_cols = np.asarray(q[bi, hi] @ kg[bi, hi].T) * scale
            keep_gcols = (gm[bi] & pm[bi])[None, :] & np.ones((t, 1), bool)
            logits = np.concatenate(
                [
                    np.where(keep_local, logits_local, NEG_INF),
                    np.where(keep_gcols, logits_global_cols, NEG_INF),
                ],
                axis=-1,
            )
            w = jax.nn.softmax(jnp.asarray(logits), axis=-1)
            w = np.asarray(w)
            o = w[:, :t] @ np.asarray(v[bi, hi]) + w[:, t:] @ np.asarray(
                vg[bi, hi]
            )
            # global rows overwrite (query_global vs key/value_global)
            gl = np.asarray(qg[bi, hi] @ kg_full[bi, hi].T) * scale
            gl = np.where(pm[bi][None, :], gl, NEG_INF)
            wg = np.asarray(jax.nn.softmax(jnp.asarray(gl), axis=-1))
            og = wg @ np.asarray(vg_full[bi, hi])
            o[gm[bi] & pm[bi]] = og[gm[bi] & pm[bi]]
            o[~pm[bi]] = 0.0
            out[bi, hi] = o
    merged = _merge_heads(jnp.asarray(out))
    return np.asarray(dense(p["o"], merged))


def test_sliding_matches_dense_reference():
    key = jax.random.PRNGKey(0)
    b, t, h, nh, w = 2, 192, 32, 2, 64
    p = sliding_attention_init(key, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, h))
    pm = np.ones((b, t), np.int32)
    pm[0, 150:] = 0  # padding tail on example 0
    gm = np.zeros((b, t), np.int32)
    gm[:, 0] = 1
    gm[0, 17] = 1
    gm[1, 99] = 1

    got = sliding_global_attention(
        p, x, nh, w, jnp.asarray(gm), jnp.asarray(pm), max_globals=4
    )
    ref = _dense_reference(p, x, nh, w, gm, pm)
    valid = pm > 0
    np.testing.assert_allclose(
        np.asarray(got)[valid], ref[valid], rtol=2e-4, atol=2e-4
    )


def test_longformer_padding_invariance():
    cfg = EncoderConfig.tiny()
    params = init_longformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 128
    ids = rng.integers(4, cfg.vocab_size, (1, t)).astype(np.int32)
    pm = np.ones((1, t), np.int32)
    pm[0, 80:] = 0

    out1 = longformer_encode(params, cfg, jnp.asarray(ids), jnp.asarray(pm))
    ids2 = ids.copy()
    ids2[0, 80:] = 7  # change padded region
    out2 = longformer_encode(params, cfg, jnp.asarray(ids2), jnp.asarray(pm))
    np.testing.assert_allclose(
        np.asarray(out1)[0, :80], np.asarray(out2)[0, :80], rtol=1e-4, atol=1e-5
    )


def test_led_decode_cache_parity():
    cfg = Seq2SeqConfig.tiny()
    params = init_led(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, s, t = 2, 128, 12
    src = rng.integers(4, cfg.vocab_size, (b, s)).astype(np.int32)
    pm = np.ones((b, s), np.int32)
    tgt = rng.integers(4, cfg.vocab_size, (b, t)).astype(np.int32)

    enc = led_encode(params, cfg, jnp.asarray(src), jnp.asarray(pm))
    full, _ = led_decode(params, cfg, jnp.asarray(tgt), enc, jnp.asarray(pm))
    full_logits = led_lm_logits(params, full)

    caches = init_decode_caches(params, cfg, b, t)
    outs = []
    for i in range(t):
        step_ids = jnp.asarray(tgt[:, i : i + 1])
        hid, caches = led_decode(
            params, cfg, step_ids, enc, jnp.asarray(pm),
            caches=caches, pos_offset=jnp.int32(i),
        )
        outs.append(led_lm_logits(params, hid))
    inc_logits = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc_logits), rtol=2e-4, atol=2e-4
    )


def test_flash_kernel_matches_xla_composite():
    """Pallas flash kernel (interpret mode) vs the XLA local-rows oracle."""
    from retrieval_augmented_mds_tpu.ops.flash_sliding import (
        _local_rows_xla,
        flash_sliding_attention,
    )

    key = jax.random.PRNGKey(3)
    # w=64 rides the 128-lane tile (block_for); t must tile by 128
    b, nh, t, dh, w, g = 2, 2, 256, 32, 64, 4
    ks = jax.random.split(key, 7)
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

    ref = _local_rows_xla(q, k, v, key_bias, kg, vg, g_bias, w)
    got = flash_sliding_attention(
        q, k, v, key_bias, kg, vg, g_bias, window=w, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_flash_kernel_gradients_flow():
    from retrieval_augmented_mds_tpu.ops.flash_sliding import sliding_local_rows

    key = jax.random.PRNGKey(4)
    b, nh, t, dh, w, g = 1, 2, 128, 16, 64, 2
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, nh, t, dh))
    k = jax.random.normal(ks[1], (b, nh, t, dh))
    v = jax.random.normal(ks[2], (b, nh, t, dh))
    kg = jax.random.normal(ks[3], (b, nh, g, dh))
    vg = jax.random.normal(ks[4], (b, nh, g, dh))
    zb = jnp.zeros((b, t), jnp.float32)
    gb = jnp.zeros((b, g), jnp.float32)

    def f(q):
        return jnp.sum(sliding_local_rows(q, k, v, zb, kg, vg, gb, w) ** 2)

    grad = jax.grad(f)(q)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
