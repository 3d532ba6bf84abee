"""Retrieval-augmented generator: the flagship model.

Rebuilds the reference's `RetrieverGenerator` + `SotasumEncoder` + `Mips`
forward path (sotasum/retriever_generator.py:55-436, sotasum/mips.py:402-519)
as one pure function over device-resident state. The key TPU-first change:
the reference's per-step host round-trip — CLS → .detach().cpu().numpy() →
FAISS → fetch texts from Arrow → re-tokenize → re-encode on GPU
(SURVEY.md §3.1 "the single biggest cost") — disappears. The corpus is
pre-tokenized once into a fixed-shape [N, L_mem] id tensor living in HBM;
search returns indices; token rows are gathered with `jnp.take` and
re-encoded on device inside the same jitted step.

Gradient structure preserved exactly (SURVEY.md §7.3):
  * search sees `stop_gradient(query_cls)` (the reference's `.detach()`
    at retriever_generator.py:143),
  * retrieval scores fed to the decoder are recomputed differentiably:
    cosine with stop-gradient norms (retriever_generator.py:158-172),
  * gradients reach the retriever only through that re-scoring and the
    memory encodings.

Memory-forcing modes (sotasum/mips.py:412-454) are static-shape variants:
"target_in"'s dynamic k+1 growth becomes a dedicated always-present target
slot whose memory mask is zeroed when the copy-forcing coin flip fails.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..index.flat import FlatIndex
from ..index.flat import search as flat_search
from .config import EncoderConfig, Seq2SeqConfig
from .copy_decoder import (
    copy_decoder_forward,
    copy_token_decoder_forward,
    init_copy_decoder,
    init_copy_token_decoder,
    mix_copy_probs,
)
from .core import Params
from .led import init_led, led_decode, led_encode, led_lm_logits
from .longformer import init_longformer, longformer_encode


@dataclasses.dataclass(frozen=True)
class RAGConfig:
    """Model-level knobs of the reference ModelConfig
    (sotasum/model_config.py:4-82), TPU-shaped."""

    led: Seq2SeqConfig
    query_enc: EncoderConfig
    mips_enc: EncoderConfig
    memory_enc: EncoderConfig
    mips_topk: int = 4  # model_config.py:49
    memory_len: int = 128  # memory_tok_max_length (no_mips.yaml:126)
    mips_disabled: bool = False  # model_config.py:44
    use_own_decoder: bool = True  # model_config.py:34
    gates_mode: str = "both"  # model_config.py:37
    skip_residual: bool = False  # model_config.py:38
    copy_decoder_layers: int = 1  # model_config.py:24
    # copy-attention heads; 0 = follow the LED decoder's head count, the
    # reference default (CopyDecoderLayer uses
    # config.decoder_attention_heads, decoder_own.py:193-195 → 12 for
    # LED-base). Param shapes are head-count-independent.
    copy_heads: int = 0
    memory_forcing: str = "no_forcing"  # model_config.py:40
    copy_forcing: float = 0.0  # model_config.py:81
    # memory_model_fixed=True (TPU-first default): the index-side mips
    # encoder ALSO produces the memory hidden states — one shared
    # re-encode of the retrieved rows serves both the differentiable
    # rescoring CLS and the copy-attention memory, halving the per-step
    # re-encode cost (the reference runs a separate third Longformer over
    # the same rows, sotasum/mips.py:465-496). False = reference-faithful
    # separate memory encoder (requires it when memory_encoder_weights or
    # a distinct memory_enc config is used).
    memory_model_fixed: bool = True
    mips_freezed: bool = False  # model_config.py:45
    mips_encoder_freezed: bool = False  # model_config.py:46
    query_encoder_freezed: bool = False
    # --- pretrained-weight sources (the reference never trains from
    # scratch: model_name at model_config.py:23 → LED load at
    # retriever_generator.py:250-253; query_encoder_path/mips_model_name
    # at model_config.py:28,61 → SPECTER2 loads at
    # retriever_generator.py:88-93 / mips.py:108-113; memory_model_name at
    # model_config.py:42 → mips.py:192-205; mips_state_dict /
    # query_state_dict at model_config.py:29,62). Hydrated by
    # models/hf_import.py:load_pretrained_rag.
    led_weights: str | None = None  # HF name or local save_pretrained dir
    query_encoder_weights: str | None = None
    mips_encoder_weights: str | None = None
    memory_encoder_weights: str | None = None
    adapter_name: str | None = None  # SPECTER2 adapter in the state_dict
    encoder_state_path: str | None = None  # encoders.npz from pretrain-retriever
    # sequence parallelism for the main LED encoder: shard the (16k) token
    # axis over the mesh "shard" axis (ops/seq_attention.py). No reference
    # equivalent — SURVEY.md §2.2's owed sequence-sharding story.
    sequence_shard: bool = False

    def __post_init__(self):
        modes = ("no_forcing", "target_only", "target_in",
                 "retrieved_forcing")  # model_config.py:39
        if self.memory_forcing not in modes:
            raise ValueError(
                f"memory_forcing={self.memory_forcing!r}; choices={modes}"
            )
        if self.memory_model_fixed:
            if self.mips_enc != self.memory_enc:
                raise ValueError(
                    "memory_model_fixed=True shares the mips encoder for "
                    "the memory re-encode, so mips_enc and memory_enc "
                    "configs must match; set memory_model_fixed=False for "
                    "a distinct memory encoder"
                )
            if self.memory_encoder_weights is not None:
                raise ValueError(
                    "memory_encoder_weights is unused when "
                    "memory_model_fixed=True (the shared mips encoder "
                    "encodes memory); set memory_model_fixed=False"
                )

    def frozen_groups(self) -> tuple[str, ...]:
        """Freeze policy → param groups (reference setup freeze logic,
        sotasum/lightning_model.py:140-146: mips_freezed freezes the whole
        retrieval stack; mips_encoder_freezed only the index-side
        encoder)."""
        groups = []
        if self.mips_freezed:
            groups += ["query_encoder", "mips_encoder"]
            if not self.memory_model_fixed:
                groups += ["memory_encoder"]
        if self.mips_encoder_freezed:
            groups += ["mips_encoder"]
        if self.query_encoder_freezed:
            groups += ["query_encoder"]
        return tuple(dict.fromkeys(groups))

    @property
    def memory_slots(self) -> int:
        return self.mips_topk + (1 if self.memory_forcing == "target_in" else 0)

    @staticmethod
    def tiny(**kw) -> "RAGConfig":
        enc = EncoderConfig.tiny()
        d = dict(
            led=Seq2SeqConfig.tiny(),
            query_enc=enc,
            mips_enc=enc,
            memory_enc=enc,
            mips_topk=2,
            memory_len=64,
        )
        d.update(kw)
        return RAGConfig(**d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MemoryStore:
    """Device-resident non-parametric memory: index + pre-tokenized corpus.

    Replaces the Arrow dataset + FAISS index pair (sotasum/mips.py:154-225).
    ``row_aids``: fixed-width per-row article-id lists (int32, −1 padded) for
    in-training retriever metrics (reference `aid` lists, mips.py:456-463).
    """

    index: Any  # FlatIndex | IVFIndex
    token_ids: jax.Array  # [N_pad, L_mem] int32
    token_mask: jax.Array  # [N_pad, L_mem] int32
    row_aids: jax.Array | None = None  # [N_pad, A] int32
    nprobe: int = dataclasses.field(
        default=8, metadata=dict(static=True)
    )  # IVF probe width (mips_nprobe, model_config.py:51)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RAGEncoderOutput:
    """Reference RGEncoderModelOutput (retriever_generator.py:210-224).

    Registered as a pytree so it can cross jit boundaries (e.g. serving
    paths that encode once and call a jitted ``generate`` separately).
    """

    enc_hidden: jax.Array  # [B, S, H]
    enc_mask: jax.Array  # [B, S]
    memory: jax.Array | None  # [B, M, H]
    memory_mask: jax.Array | None  # [B, M]
    memory_bias: jax.Array | None  # [B, M]
    copy_seq: jax.Array | None  # [B, M]
    mips_scores: jax.Array | None  # [B, slots]
    retrieved_idx: jax.Array | None  # [B, k]
    faiss_scores: jax.Array | None = None  # [B, k] raw index scores
    query_cls: jax.Array | None = None  # [B, H] (reference query_cls out)


def init_rag(key, cfg: RAGConfig) -> Params:
    ks = jax.random.split(key, 6)
    params: Params = {
        "led": init_led(ks[0], cfg.led),
        "query_encoder": init_longformer(ks[1], cfg.query_enc),
    }
    params["mips_encoder"] = init_longformer(ks[2], cfg.mips_enc)
    if not cfg.memory_model_fixed:
        params["memory_encoder"] = init_longformer(ks[3], cfg.memory_enc)
    if cfg.use_own_decoder:
        params["copy_head"] = init_copy_decoder(
            ks[4], cfg.led.d_model, cfg.copy_decoder_layers, cfg.led.d_ffn,
            cfg.gates_mode,
        )
    else:
        params["copy_head"] = init_copy_token_decoder(
            ks[4], cfg.led.d_model, cfg.led.d_ffn
        )
    return params


def init_rag_pretrained(key, cfg: RAGConfig) -> Params:
    """init_rag + pretrained-weight hydration when the config names any
    weight source (the reference's always-pretrained startup path)."""
    params = init_rag(key, cfg)
    if any(
        getattr(cfg, f)
        for f in (
            "led_weights", "query_encoder_weights", "mips_encoder_weights",
            "memory_encoder_weights", "encoder_state_path",
        )
    ):
        from .hf_import import load_pretrained_rag

        params = load_pretrained_rag(params, cfg)
    return params


def _encode_memory_rows(
    enc_params: Params, enc_cfg: EncoderConfig, ids: jax.Array, mask: jax.Array,
    *, dtype, remat: bool,
) -> jax.Array:
    """[B, slots, L] → hidden [B, slots, L, H] via the shared encoder."""
    b, s, l = ids.shape
    flat_ids = ids.reshape(b * s, l)
    flat_mask = mask.reshape(b * s, l)
    hid = longformer_encode(
        enc_params, enc_cfg, flat_ids, flat_mask, dtype=dtype, remat=remat
    )
    return hid.reshape(b, s, l, -1)


def rag_encode(
    params: Params,
    cfg: RAGConfig,
    store: MemoryStore | None,
    batch: dict[str, Any],
    *,
    mesh=None,
    dtype=jnp.float32,
    remat: bool | str = False,
    copy_force: jax.Array | None = None,  # [] bool: target_in coin flip
) -> RAGEncoderOutput:
    """The "R" of RAG + the main document encoder.

    batch keys: input_ids/attention_mask [B, S]; query_input_ids/
    query_attention_mask [B, Lq]; optional mips_ignore [B, I] (self-
    exclusion doc ids); optional target_memory_ids/mask [B, L_mem]
    (memory forcing); optional input_memory_ids/mask [B, D, L_mem] +
    input_memory_count [B] (dual mode: first docs of the input as memory,
    sotasum/mips.py:445-451).
    """
    input_ids = batch["input_ids"]
    enc_mask = batch["attention_mask"]

    memory = memory_mask = memory_bias = copy_seq = None
    mips_scores = idx = faiss_scores = query_cls = None

    if not cfg.mips_disabled and store is not None:
        lf = cfg.query_enc
        q_hidden = longformer_encode(
            params["query_encoder"], lf, batch["query_input_ids"],
            batch["query_attention_mask"], dtype=dtype, remat=remat,
        )
        query_cls = q_hidden[:, 0].astype(jnp.float32)  # [B, H]
        b = query_cls.shape[0]
        k = cfg.mips_topk
        faiss_scores = None

        if cfg.memory_forcing == "target_only":
            # memory = gold target only (mips.py:412-419); k = 1 slot
            mem_ids = batch["target_memory_ids"][:, None]  # [B, 1, L]
            mem_mask = batch["target_memory_mask"][:, None]
            idx = faiss_scores = None
        else:
            q_detached = jax.lax.stop_gradient(query_cls)
            # retrieved_forcing disables self-exclusion: the query's own
            # articles may be retrieved (reference passes indices=None,
            # sotasum/lightning_model.py:202)
            ignore = (
                None
                if cfg.memory_forcing == "retrieved_forcing"
                else batch.get("mips_ignore")
            )
            if isinstance(store.index, FlatIndex):
                faiss_scores, idx = flat_search(
                    store.index, q_detached, k=k, ignore=ignore, mesh=mesh,
                )
            else:  # IVF (coarse-quantized) index
                from ..index.ivf import ivf_search, ivf_search_sharded
                from ..parallel.mesh import SHARD_AXIS

                n_shards = (
                    mesh.shape.get(SHARD_AXIS, 1) if mesh is not None else 1
                )
                if n_shards > 1 and store.index.n_clusters % n_shards == 0:
                    # cluster-partitioned search over the mesh (the sharded
                    # analog of the reference's rank-chunked FAISS protocol,
                    # sotasum/mips.py:226-244)
                    faiss_scores, idx = ivf_search_sharded(
                        store.index, q_detached, mesh, k=k,
                        nprobe=store.nprobe, ignore=ignore,
                    )
                else:
                    faiss_scores, idx = ivf_search(
                        store.index, q_detached, k=k, nprobe=store.nprobe,
                        ignore=ignore,
                    )
            safe_idx = jnp.maximum(idx, 0)
            mem_ids = jnp.take(store.token_ids, safe_idx, axis=0)  # [B,k,L]
            mem_mask = jnp.take(store.token_mask, safe_idx, axis=0)

            if cfg.memory_forcing == "target_in":
                # dedicated target slot, masked off when the coin flip
                # fails (reference grows k dynamically, mips.py:430-439)
                force = (
                    copy_force
                    if copy_force is not None
                    else jnp.asarray(cfg.copy_forcing > 0.0)
                )
                t_ids = batch["target_memory_ids"][:, None]
                t_mask = (
                    batch["target_memory_mask"][:, None]
                    * force.astype(batch["target_memory_mask"].dtype)
                )
                mem_ids = jnp.concatenate([t_ids, mem_ids], axis=1)
                mem_mask = jnp.concatenate([t_mask, mem_mask], axis=1)
            elif "input_memory_ids" in batch:
                # dual mode: slot j = input doc j where j < count, else
                # retrieved[j - count] (mips.py:445-451), statically shaped
                d_in = batch["input_memory_ids"].shape[1]
                count = batch["input_memory_count"][:, None]  # [B, 1]
                slot = jnp.arange(k)[None, :]
                from_input = slot < count
                in_slot = jnp.minimum(slot, d_in - 1)
                ret_slot = jnp.maximum(slot - count, 0)
                pick = lambda a, i: jnp.take_along_axis(  # noqa: E731
                    a, i[..., None], axis=1
                )
                mem_ids = jnp.where(
                    from_input[..., None],
                    pick(batch["input_memory_ids"], in_slot),
                    pick(mem_ids, ret_slot),
                )
                mem_mask = jnp.where(
                    from_input[..., None],
                    pick(batch["input_memory_mask"], in_slot),
                    pick(mem_mask, ret_slot),
                )

        slots = mem_ids.shape[1]

        # --- differentiable re-scoring (retriever_generator.py:158-172) ---
        mips_hid = _encode_memory_rows(
            params["mips_encoder"], cfg.mips_enc, mem_ids, mem_mask,
            dtype=dtype, remat=remat,
        )
        mips_cls = mips_hid[:, :, 0].astype(jnp.float32)  # [B, slots, H]
        raw = jnp.einsum("bh,bsh->bs", query_cls, mips_cls)
        qn = jax.lax.stop_gradient(
            jnp.linalg.norm(query_cls, axis=-1, keepdims=True)
        )
        mn = jax.lax.stop_gradient(jnp.linalg.norm(mips_cls, axis=-1))
        mips_scores = raw / jnp.maximum(qn * mn, 1e-12)  # [B, slots]

        # --- memory re-encode (mips.py:478-496) --------------------------
        if cfg.memory_model_fixed:
            # shared re-encode: the rescoring pass above already produced
            # hidden states for every retrieved token — reuse them as the
            # copy-attention memory instead of running a second encoder
            # over the same rows (the reference's memory_encoder,
            # mips.py:192-205, is a separate third Longformer)
            mem_hid = mips_hid
        else:
            mem_hid = _encode_memory_rows(
                params["memory_encoder"], cfg.memory_enc, mem_ids, mem_mask,
                dtype=dtype, remat=remat,
            )
        h = mem_hid.shape[-1]
        L = mem_ids.shape[-1]
        memory = mem_hid.reshape(b, slots * L, h)
        # bos/eos masked out of copyable positions (mips.py:498-505)
        copy_ok = (
            (mem_ids != cfg.memory_enc.bos_id)
            & (mem_ids != cfg.memory_enc.eos_id)
            & (mem_mask > 0)
        )
        memory_mask = copy_ok.reshape(b, slots * L).astype(jnp.int32)
        memory_bias = jnp.broadcast_to(
            mips_scores[:, :, None], (b, slots, L)
        ).reshape(b, slots * L)
        copy_seq = mem_ids.reshape(b, slots * L)

    # --- main document encoder: global attn on <s> + <DOC_SEP> -----------
    global_mask = jnp.zeros_like(input_ids).at[:, 0].set(1)
    global_mask = jnp.where(input_ids == cfg.led.doc_sep_id, 1, global_mask)
    enc_hidden = led_encode(
        params["led"], cfg.led, input_ids, enc_mask, global_mask,
        dtype=dtype, remat=remat,
        seq_mesh=mesh if (cfg.sequence_shard and mesh is not None) else None,
    )
    return RAGEncoderOutput(
        enc_hidden=enc_hidden,
        enc_mask=enc_mask,
        memory=memory,
        memory_mask=memory_mask,
        memory_bias=memory_bias,
        copy_seq=copy_seq,
        mips_scores=mips_scores,
        retrieved_idx=idx,
        faiss_scores=faiss_scores,
        query_cls=query_cls,
    )


def rag_decode(
    params: Params,
    cfg: RAGConfig,
    enc_out: RAGEncoderOutput,
    decoder_input_ids: jax.Array,  # [B, T]
    *,
    caches=None,
    pos_offset=0,
    dtype=jnp.float32,
    remat: bool | str = False,
    copy_kv=None,  # per-layer precomputed copy-head memory K/V
):
    """Decoder + copy head → (log_probs_or_logits [B, T, V], aux, caches).

    With memory: returns LOG-PROBS of the gated mixture
    (retriever_generator.py:391-404). Without: raw LM logits.
    aux = {"copy_gate": [B,T,1], "copy_probs": [B,T,M]} when applicable.
    """
    hid, caches = led_decode(
        params["led"], cfg.led, decoder_input_ids, enc_out.enc_hidden,
        enc_out.enc_mask, caches=caches, pos_offset=pos_offset, dtype=dtype,
        remat=remat,
    )
    aux: dict[str, Any] = {}
    if cfg.mips_disabled or enc_out.memory is None:
        return led_lm_logits(params["led"], hid), aux, caches

    if cfg.use_own_decoder:
        gen_gate, copy_gate, copy_probs = copy_decoder_forward(
            params["copy_head"], hid, enc_out.memory.astype(hid.dtype),
            enc_out.memory_mask, enc_out.memory_bias,
            n_heads=cfg.copy_heads or cfg.led.n_heads,
            gates_mode=cfg.gates_mode,
            skip_residual=cfg.skip_residual, copy_kv=copy_kv,
        )
        lm_logits = led_lm_logits(params["led"], hid)
        out = mix_copy_probs(lm_logits, gen_gate, copy_probs, enc_out.copy_seq)
        aux = {"copy_gate": copy_gate, "copy_probs": copy_probs}
        return out, aux, caches

    out = copy_token_decoder_forward(
        params["copy_head"], hid, enc_out.memory.astype(hid.dtype),
        enc_out.memory_mask, enc_out.memory_bias, enc_out.copy_seq,
        params["led"]["shared_emb"]["table"],
    )
    return out, aux, caches


def rag_forward(
    params: Params,
    cfg: RAGConfig,
    store: MemoryStore | None,
    batch: dict[str, Any],
    *,
    mesh=None,
    dtype=jnp.float32,
    remat: bool | str = False,
    copy_force: jax.Array | None = None,
):
    """Full teacher-forced forward (reference LongformerLightning.forward,
    sotasum/lightning_model.py:188-268). Returns (out, aux, enc_out)."""
    enc_out = rag_encode(
        params, cfg, store, batch, mesh=mesh, dtype=dtype, remat=remat,
        copy_force=copy_force,
    )
    out, aux, _ = rag_decode(
        params, cfg, enc_out, batch["decoder_input_ids"], dtype=dtype,
        remat=remat,
    )
    return out, aux, enc_out
