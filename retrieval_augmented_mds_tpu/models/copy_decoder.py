"""Memory-guided copy heads: per-token copy-vs-generate gating.

Two heads, selected by `use_own_decoder` (reference
sotasum/retriever_generator.py:266-289):

  * Head A — "own decoder" (sotasum/decoder_own.py): a stack of
    cross-attention-only layers over the retrieved memory, where the
    attention logits get a learned score bias ``beta·memory_bias +
    beta_bias`` (decoder_own.py:110-115) — retrieval scores steer the
    copy attention. Gates come from `gates_mode` ∈ {nmt, onlycopy, both}
    (decoder_own.py:527-536).

  * Head B — CopyTokenDecoder (sotasum/decoder.py:194-298): one
    single-head alignment attention with additive memory bias, FFN, and a
    diverter Linear(2H→2); vocabulary logits from the tied target
    embedding.

Both heads end in the same probability mix (retriever_generator.py:391-404,
decoder.py:266-290):
    p = gen_gate · softmax(lm_logits)
    p[copy_seq] += copy_gate · alignment      (scatter-add over vocab ids)
    out = log(p + 1e-7)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import (
    NEG_INF,
    Params,
    dense,
    dense_init,
    ffn,
    ffn_init,
    layernorm,
    layernorm_init,
    mha_init,
)

EPS = 1e-7  # fp16-era epsilon kept for parity (decoder.py:280-283)


# ---------------------------------------------------------------------------
# shared: probability mixing
# ---------------------------------------------------------------------------

def _scatter_copy_mass(
    probs: jax.Array,  # [B, T, V] f32 (mutated additively)
    copy_probs: jax.Array,  # [B, T, M]
    copy_seq: jax.Array,  # [B, M]
) -> jax.Array:
    """probs[b, :, copy_seq[b, m]] += copy_probs[b, :, m].

    Batched-window scatter: the memory token ids are constant across T,
    so the scatter carries B·M indices each writing a T-column — 4×
    faster on TPU than the naive B·T·M-index formulation."""
    upd = jnp.transpose(copy_probs.astype(jnp.float32), (0, 2, 1))  # [B,M,T]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(2,),
        scatter_dims_to_operand_dims=(2,),
        operand_batching_dims=(0,),
        scatter_indices_batching_dims=(0,),
    )
    return jax.lax.scatter_add(
        probs, copy_seq.astype(jnp.int32)[:, :, None], upd, dn,
        indices_are_sorted=False, unique_indices=False,
    )


def mix_copy_probs(
    lm_logits: jax.Array,  # [B, T, V] f32
    gen_gate: jax.Array,  # [B, T, 1]
    copy_probs: jax.Array,  # [B, T, M] (= copy_gate · alignment)
    copy_seq: jax.Array,  # [B, M] int32 vocab ids of memory tokens
) -> jax.Array:
    """Log of the gated mixture; mass conservation: sums to ~1 per token."""
    probs = gen_gate.astype(jnp.float32) * jax.nn.softmax(
        lm_logits.astype(jnp.float32), axis=-1
    )
    if copy_seq.shape[0] != probs.shape[0]:
        # beam decoding against un-expanded memory: copy_seq is [b, M]
        # while probs is [b·beams, T, V]; ids are tiny — repeat them
        copy_seq = jnp.repeat(
            copy_seq, probs.shape[0] // copy_seq.shape[0], axis=0
        )
    probs = _scatter_copy_mass(probs, copy_probs, copy_seq)
    return jnp.log(probs + EPS)


def copy_distribution_over_vocab(
    copy_probs: jax.Array, copy_seq: jax.Array, vocab: int
) -> jax.Array:
    """[B, T, M] copy mass scattered to [B, T, V] (diagnostics; reference
    `copy_probs_sentence`, retriever_generator.py:401-403)."""
    b, t, _ = copy_probs.shape
    out = jnp.zeros((b, t, vocab), jnp.float32)
    return _scatter_copy_mass(out, copy_probs, copy_seq)


# ---------------------------------------------------------------------------
# Head A: cross-attention copy decoder ("own decoder", decoder_own.py)
# ---------------------------------------------------------------------------

def init_copy_decoder(
    key,
    d_model: int,
    n_layers: int,
    d_ffn: int,
    gates_mode: str = "both",
) -> Params:
    assert gates_mode in ("nmt", "onlycopy", "both")
    ks = jax.random.split(key, n_layers + 1)
    layers = []
    for i in range(n_layers):
        k1, k2 = jax.random.split(ks[i])
        layers.append(
            {
                "cross_attn": mha_init(k1, d_model),
                "beta": jnp.ones((), jnp.float32),
                "beta_bias": jnp.zeros((), jnp.float32),
                "cross_ln": layernorm_init(d_model),
                "ffn": ffn_init(k2, d_model, d_ffn),
                "ffn_ln": layernorm_init(d_model),
            }
        )
    div_in = d_model if gates_mode == "onlycopy" else 2 * d_model
    return {
        "layers": layers,
        "align_ln": layernorm_init(d_model),
        "diverter": dense_init(ks[-1], div_in, 2),
    }


def precompute_copy_kv(params: Params, memory: jax.Array, n_heads: int):
    """Per-layer memory K/V for Head A — computed once per generation
    (the memory is fixed across decode steps; reprojecting [B, M, H]
    every token dominates small-batch decode)."""
    from .core import _split_heads

    out = []
    for lp in params["layers"]:
        out.append(
            (
                _split_heads(dense(lp["cross_attn"]["k"], memory), n_heads),
                _split_heads(dense(lp["cross_attn"]["v"], memory), n_heads),
            )
        )
    return out


def _biased_cross_attention(
    lp: Params,
    x: jax.Array,  # [B, T, H]
    memory: jax.Array,  # [B, M, H]
    memory_mask: jax.Array,  # [B, M] {0,1}
    memory_bias: jax.Array,  # [B, M] retrieval scores
    n_heads: int,
    kv=None,  # optional precomputed (k, v) head tensors
):
    """Single cross-attn with score-biased logits; returns (out, weights).

    The learned scalar gate on the bias is the `beta * attention_bias +
    beta_bias` mechanism of decoder_own.py:110-115. Beam decoding: when
    x's batch is a multiple of the memory batch (un-expanded memory), the
    beam axis is folded into the query time axis (core._fold_groups) so
    memory K/V are read once per batch item, not once per beam.
    """
    from .core import _fold_groups, _merge_heads, _split_heads, _unfold_groups

    dh = lp["cross_attn"]["q"]["kernel"].shape[1] // n_heads
    b_mem = memory_mask.shape[0]
    t = x.shape[1]
    q = _split_heads(dense(lp["cross_attn"]["q"], x), n_heads)
    if kv is not None:
        k, v = kv
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    else:
        k = _split_heads(dense(lp["cross_attn"]["k"], memory), n_heads)
        v = _split_heads(dense(lp["cross_attn"]["v"], memory), n_heads)
    g = 1
    if q.shape[0] != b_mem:
        assert q.shape[0] % b_mem == 0, (q.shape, b_mem)
        g = q.shape[0] // b_mem
        q = _fold_groups(q, g)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    logits = logits + (
        lp["beta"] * memory_bias.astype(jnp.float32) + lp["beta_bias"]
    )[:, None, None, :]
    logits = jnp.where((memory_mask > 0)[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(x.dtype), v)
    if g > 1:
        out = _unfold_groups(out, g)
    out = dense(lp["cross_attn"]["o"], _merge_heads(out))
    align = jnp.mean(w, axis=1)  # heads-averaged weights → [b, g·T, M]
    if g > 1:
        align = align.reshape(b_mem * g, t, align.shape[-1])
    return out, align


def copy_decoder_forward(
    params: Params,
    decoder_hidden: jax.Array,  # [B, T, H] (LED decoder last hidden states)
    memory: jax.Array,  # [B, M, H]
    memory_mask: jax.Array,  # [B, M]
    memory_bias: jax.Array,  # [B, M]
    *,
    n_heads: int = 1,
    gates_mode: str = "both",
    skip_residual: bool = False,
    copy_kv=None,  # optional per-layer precomputed memory K/V
):
    """Returns (gen_gate [B,T,1], copy_gate [B,T,1], copy_probs [B,T,M]).

    Mirrors DecoderForCopyGeneration.forward (decoder_own.py:474-540):
    copy_probs = copy_gate · (last layer's cross-attention weights).
    """
    x = decoder_hidden
    attn_out, align = None, None
    for li, lp in enumerate(params["layers"]):
        attn_out, align = _biased_cross_attention(
            lp, x, memory, memory_mask, memory_bias, n_heads,
            kv=None if copy_kv is None else copy_kv[li],
        )
        x = layernorm(lp["cross_ln"], x + attn_out)
        f = ffn(lp["ffn"], x)
        x = layernorm(lp["ffn_ln"], f if skip_residual else x + f)

    if gates_mode == "nmt":
        gates_in = jnp.concatenate(
            [x, layernorm(params["align_ln"], attn_out)], axis=-1
        )
    elif gates_mode == "onlycopy":
        gates_in = x
    else:  # "both"
        gates_in = jnp.concatenate([x, decoder_hidden], axis=-1)

    gates = jax.nn.softmax(
        dense(params["diverter"], gates_in).astype(jnp.float32), axis=-1
    )
    gen_gate, copy_gate = gates[..., :1], gates[..., 1:]
    copy_probs = copy_gate * align.astype(jnp.float32)
    return gen_gate, copy_gate, copy_probs


# ---------------------------------------------------------------------------
# Head B: CopyTokenDecoder (decoder.py)
# ---------------------------------------------------------------------------

def init_copy_token_decoder(key, d_model: int, d_ffn: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "align": mha_init(k1, d_model),
        "align_ln": layernorm_init(d_model),
        "ffn": ffn_init(k2, d_model, d_ffn),
        "ffn_ln": layernorm_init(d_model),
        "diverter": dense_init(k3, 2 * d_model, 2),
    }


def copy_token_decoder_forward(
    params: Params,
    decoder_hidden: jax.Array,  # [B, T, H]
    memory: jax.Array,  # [B, M, H]
    memory_mask: jax.Array,  # [B, M]
    memory_bias: jax.Array,  # [B, M]
    copy_seq: jax.Array,  # [B, M] vocab ids
    emb_table: jax.Array,  # [V, H] tied target embedding
):
    """Full Head-B path → log-probs [B, T, V] (decoder.py:224-298)."""
    from .core import _fold_groups, _merge_heads, _split_heads, _unfold_groups

    h = decoder_hidden.shape[-1]
    b_mem = memory_mask.shape[0]
    t = decoder_hidden.shape[1]
    q = _split_heads(dense(params["align"]["q"], decoder_hidden), 1)
    k = _split_heads(dense(params["align"]["k"], memory), 1)
    v = _split_heads(dense(params["align"]["v"], memory), 1)
    g = 1
    if q.shape[0] != b_mem:  # beam fold (see _biased_cross_attention)
        assert q.shape[0] % b_mem == 0, (q.shape, b_mem)
        g = q.shape[0] // b_mem
        q = _fold_groups(q, g)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(h))
    logits = logits + memory_bias.astype(jnp.float32)[:, None, None, :]
    logits = jnp.where((memory_mask > 0)[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)  # [B, 1, g·T, M]
    out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(memory.dtype), v)
    if g > 1:
        out = _unfold_groups(out, g)
    attn = dense(params["align"]["o"], _merge_heads(out))
    align = w[:, 0]  # single head
    if g > 1:
        align = align.reshape(b_mem * g, t, align.shape[-1])

    outs = layernorm(params["align_ln"], decoder_hidden + attn)
    outs = layernorm(params["ffn_ln"], ffn(params["ffn"], outs))

    gates_in = jnp.concatenate(
        [outs, layernorm(params["align_ln"], attn)], axis=-1
    )
    gates = jax.nn.softmax(
        dense(params["diverter"], gates_in).astype(jnp.float32), axis=-1
    )
    gen_gate, copy_gate = gates[..., :1], gates[..., 1:]

    vocab_logits = jnp.einsum(
        "bth,vh->btv", outs, emb_table.astype(outs.dtype),
        preferred_element_type=jnp.float32,
    )
    return mix_copy_probs(
        vocab_logits, gen_gate, copy_gate * align.astype(jnp.float32), copy_seq
    )
