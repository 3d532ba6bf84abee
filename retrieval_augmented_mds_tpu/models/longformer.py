"""Longformer-style long-context encoder (pure JAX).

Serves every encoder role the reference fills with HF torch stacks
(SURVEY.md §2.4): the memory encoder (sotasum/mips.py:192-205), the
retriever dual encoders (sotasum/retriever_lightning.py:102-140), and the
SPECTER2-class query/index encoders (sotasum/mips.py:87-151,
sotasum/retriever_generator.py:88-93 — CLS pooling with global `<s>`
attention). RoBERTa-style post-LN blocks + sliding/global attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.sliding_attention import (
    sliding_attention_init,
    sliding_global_attention,
)
from .config import EncoderConfig
from .core import (
    Params,
    dense,
    dense_init,
    embed,
    embedding_init,
    ffn,
    ffn_init,
    layernorm,
    layernorm_init,
    maybe_remat,
)


def init_longformer(key, cfg: EncoderConfig) -> Params:
    ks = jax.random.split(key, 3 + cfg.n_layers)
    layers = []
    for i in range(cfg.n_layers):
        k1, k2, k3 = jax.random.split(ks[3 + i], 3)
        layer = {
            "attn": sliding_attention_init(k1, cfg.d_model),
            "attn_ln": layernorm_init(cfg.d_model),
            "ffn": ffn_init(k2, cfg.d_model, cfg.d_ffn),
            "ffn_ln": layernorm_init(cfg.d_model),
        }
        if cfg.adapter_dim:
            # Pfeiffer bottleneck (SPECTER2 adapter architecture,
            # sotasum/mips.py:108-113): down → ReLU → up, residual added
            # before the block LayerNorm
            ka, kb = jax.random.split(k3)
            layer["adapter"] = {
                "down": dense_init(ka, cfg.d_model, cfg.adapter_dim),
                "up": dense_init(kb, cfg.adapter_dim, cfg.d_model),
            }
        layers.append(layer)
    return {
        "tok_emb": embedding_init(ks[0], cfg.vocab_size, cfg.d_model),
        "pos_emb": embedding_init(
            ks[1], cfg.max_len + cfg.pos_offset, cfg.d_model
        ),
        "emb_ln": layernorm_init(cfg.d_model),
        "layers": layers,
    }


def longformer_encode(
    params: Params,
    cfg: EncoderConfig,
    ids: jax.Array,  # [B, T] int32 (T multiple of window; pad with pad_id)
    padding_mask: jax.Array,  # [B, T] {0,1}
    global_mask: jax.Array | None = None,  # [B, T]; default: CLS only
    *,
    dtype=jnp.float32,
    remat: bool | str = False,
    seq_mesh=None,  # sequence parallelism: shard T over mesh "shard" axis
) -> jax.Array:
    """Returns hidden states [B, T, H]. CLS pooling = out[:, 0].

    With ``seq_mesh``, attention runs sequence-sharded over the mesh's
    ``shard`` axis (ops/seq_attention.py: ppermute halos + G-sized psum
    globals); everything else is per-token, so XLA partitions it from
    the activation sharding constraint alone.
    """
    b, t = ids.shape
    if global_mask is None:
        # global attention on <s> (reference mips.py:124-126)
        global_mask = jnp.zeros_like(padding_mask).at[:, 0].set(1)
    global_mask = global_mask * padding_mask

    pos = jnp.arange(t)[None, :] + cfg.pos_offset
    x = embed(params["tok_emb"], ids, dtype) + embed(
        params["pos_emb"], pos, dtype
    )
    if "type_emb" in params:
        # single token-type row (RoBERTa-family constant; hf_import)
        x = x + params["type_emb"]["table"][0].astype(x.dtype)
    x = layernorm(params["emb_ln"], x)

    seq_constraint = None
    if seq_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.seq_attention import sliding_global_attention_seqsharded
        from ..parallel.mesh import DATA_AXIS, SHARD_AXIS

        da = DATA_AXIS if DATA_AXIS in seq_mesh.shape else None
        seq_constraint = NamedSharding(seq_mesh, P(da, SHARD_AXIS, None))
        x = jax.lax.with_sharding_constraint(x, seq_constraint)

    def layer_fn(x, lp):
        if seq_mesh is not None:
            a = sliding_global_attention_seqsharded(
                lp["attn"], x, cfg.n_heads, cfg.window, global_mask,
                padding_mask, cfg.max_globals, seq_mesh,
            )
        else:
            a = sliding_global_attention(
                lp["attn"], x, cfg.n_heads, cfg.window, global_mask,
                padding_mask, cfg.max_globals,
            )
        x = layernorm(lp["attn_ln"], x + a)
        f = ffn(lp["ffn"], x)
        if "adapter" in lp:
            # adapter residual sits BEFORE the block LayerNorm
            # (Pfeiffer residual_before_ln semantics)
            f = f + dense(lp["adapter"]["up"],
                          jax.nn.relu(dense(lp["adapter"]["down"], f)))
        return layernorm(lp["ffn_ln"], x + f)

    layer_fn = maybe_remat(layer_fn, remat)
    for lp in params["layers"]:
        x = layer_fn(x, lp)
    return x


# ---------------------------------------------------------------------------
# Pooling heads used by the retriever stacks
# ---------------------------------------------------------------------------

def init_projection(key, d_model: int, d_out: int) -> Params:
    """Optional pooled projection (reference retriever_lightning.py:142-153)."""
    return {"proj": dense_init(key, d_model, d_out)}


def cls_pool(hidden: jax.Array, proj: Params | None = None) -> jax.Array:
    out = hidden[:, 0]
    if proj is not None:
        out = dense(proj["proj"], out)
    return out
