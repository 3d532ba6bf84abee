"""Train step + train-time index refresh.

Replaces the Lightning orchestration layer (`LongformerLightning`,
sotasum/lightning_model.py:91-433):

  * `train_step` — jitted value_and_grad + optax update. Data parallelism
    = batch sharded over the mesh ``data`` axis; XLA inserts the gradient
    reduction from the sharding constraints (the NCCL all-reduce of
    SURVEY.md §2.2 row 1). ZeRO-2 = optimizer state sharded by
    parallel/zero.py specs.
  * copy-mechanism diagnostics logged per step (reference
    lightning_model.py:239-266).
  * `refresh_store` — the train-time index rebuild. The reference's
    barrier-stepped filesystem protocol (encode per rank → Arrow shards →
    rank-0 FAISS build → all-rank reload; SURVEY.md §3.2) collapses into:
    re-embed the corpus on device under the CURRENT mips encoder, build a
    new FlatIndex, return a new MemoryStore. Double buffering is a
    pointer swap in the caller's loop; between refreshes queries hit the
    stale index while decoder-facing scores stay fresh (stale-tolerance
    semantics of lightning_model.py:148-162 preserved).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.longformer import longformer_encode
from ..models.retriever_generator import (
    MemoryStore,
    RAGConfig,
    rag_forward,
)
from .loss import summarization_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, tx):
        return TrainState(
            params=params, opt_state=tx.init(params), step=jnp.int32(0)
        )


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Training knobs of the reference ModelConfig (model_config.py:17-22)
    + trainer YAML (no_mips.yaml:58-60)."""

    lr: float = 3e-5
    warmup_steps: int = 1000
    total_steps: int = 100_000
    label_smoothing_eps: float = 0.1
    grad_clip: float | None = 0.1
    weight_decay: float = 0.0
    accumulate_steps: int = 1
    frozen_groups: tuple[str, ...] = ()  # mips_freezed etc.
    # Step-interval checkpointing: save the train state every N steps
    # regardless of eval wins (crash insurance the reference gets from
    # Lightning's per-epoch ModelCheckpoint, config/no_mips.yaml:27-33).
    # 0 = only the rouge1-monitored best checkpoint. Periodic saves never
    # prune the best-marked checkpoint (utils/checkpoint.py).
    save_every: int = 0
    # gradient checkpointing (model_config.py:35): False | True ("full")
    # | a jax.checkpoint_policies name, e.g.
    # "dots_with_no_batch_dims_saveable" (keep matmul outputs, recompute
    # the rest — the HBM/FLOPs middle ground for large batches)
    remat: bool | str = False
    # Adam first-moment storage dtype; None = f32 (reference-faithful).
    # Default bf16: the update is pure HBM bandwidth, see
    # train/optimizer.py build_optimizer.
    adam_mu_dtype: str | None = "bfloat16"
    # Blockwise 8-bit Adam state (train/adam8bit.py): int8 mu +
    # log2-affine uint8 nu. CAPACITY-ONLY: ~1.6 GB of state HBM freed on
    # the 268M-param RAG model, but the update itself measures SLOWER
    # than the default bf16-mu chain (r5 hardware: ~26-30 ms vs 6.4 ms
    # full update @162M params, artifacts/adam8bit_dissect.jsonl) — the
    # narrow-dtype streams and per-block scale columns defeat the HBM
    # traffic win on TPU. Turn on only when optimizer state does not fit.
    # Overrides adam_mu_dtype. The TPU-native stand-in for the
    # reference's DeepSpeed ZeRO CPU offload (lightning_model.py:16).
    adam_8bit: bool = False
    # Route the 8-bit superleaf update through the fused Pallas kernel
    # (ops/adam8bit_update.py). Default OFF since r5: the isolated kernel
    # measures 19.6 ms = 8.7x roofline @162M and no faster than the XLA
    # composite (~17 ms) — Mosaic's narrow-dtype tile relayouts / vreg
    # spills eat the fusion win, and a byte-plane int32-packed rework
    # measured EQUAL (19.35 ms) and was reverted; evidence in
    # artifacts/adam8bit_dissect.jsonl. On a mesh the kernel runs
    # per-shard under shard_map, composing with ZeRO-sharded state.
    # Off = XLA composite (same superleaf layout, same state tree).
    adam_8bit_fused: bool = False
    # Per-parameter-group gradient norms in the step metrics (the
    # GradientsPrintingCallback analog, sotasum/lightning_model.py:31-36):
    # one `grad_norm_<group>` per top-level param group. Off by default —
    # it adds a reduction per group to the compiled step.
    grad_group_norms: bool = False


def make_train_step(
    cfg: RAGConfig,
    tx: optax.GradientTransformation,
    hyper: TrainHyper,
    *,
    mesh=None,
    dtype=jnp.float32,
    remat: bool | str = False,
) -> Callable:
    """Returns jitted (state, store, batch, copy_force) → (state, metrics)."""

    def loss_fn(params, store, batch, copy_force):
        out, aux, enc_out = rag_forward(
            params, cfg, store, batch, mesh=mesh, dtype=dtype, remat=remat,
            copy_force=copy_force,
        )
        if cfg.mips_disabled or enc_out.memory is None:
            log_probs = jax.nn.log_softmax(out, axis=-1)
        else:
            log_probs = out
        loss = summarization_loss(
            log_probs, batch["labels"], hyper.label_smoothing_eps,
            cfg.led.pad_id,
        )
        metrics = {"loss": loss}
        if aux.get("copy_gate") is not None:
            # copy diagnostics (lightning_model.py:239-266)
            mask = (batch["labels"] != cfg.led.pad_id)[..., None]
            metrics["copy_gate_mean"] = jnp.sum(
                aux["copy_gate"] * mask
            ) / jnp.maximum(jnp.sum(mask), 1)
            metrics["copy_probs_mass"] = jnp.mean(
                jnp.sum(aux["copy_probs"], axis=-1)
            )
        if enc_out.mips_scores is not None:
            metrics["mips_score_mean"] = jnp.mean(enc_out.mips_scores)
        if (
            enc_out.retrieved_idx is not None
            and store is not None
            and store.row_aids is not None
            and "gold_aid" in batch
        ):
            # in-training retriever metrics vs gold cited aid (reference
            # log_retriever_metrics, sotasum/mips.py:456-463)
            from ..retriever.metrics import retriever_metrics_fixed

            r_aids = jnp.take(
                store.row_aids, jnp.maximum(enc_out.retrieved_idx, 0), axis=0
            )  # [B, k, A]
            hits = (r_aids == batch["gold_aid"][:, None, None]).any(-1)
            counts = batch.get(
                "aid_counts", jnp.ones_like(batch["gold_aid"])
            )
            rm = retriever_metrics_fixed(hits, counts)
            metrics.update({f"retriever_{k_}": v for k_, v in rm.items()})
        return loss, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, store, batch, copy_force):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, store, batch, copy_force
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if hyper.grad_group_norms:
            # per-group gradient diagnostics (GradientsPrintingCallback,
            # sotasum/lightning_model.py:31-36 — group granularity here;
            # per-leaf printing does not fit a compiled step)
            for k, sub in grads.items():
                metrics[f"grad_norm_{k}"] = optax.global_norm(sub)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def make_retriever_train_step(cfg, tx, *, dtype=jnp.float32, remat=False,
                              gather_axis=None):
    """Contrastive pretraining step (reference RetrieverLightning
    training_step, sotasum/retriever_lightning.py:197-281)."""
    from ..retriever.contrastive import contrastive_loss

    def loss_fn(params, batch):
        return contrastive_loss(
            params, cfg, batch, dtype=dtype, remat=remat,
            gather_axis=gather_axis,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step


# ---------------------------------------------------------------------------
# Index refresh
# ---------------------------------------------------------------------------

def encode_corpus(
    enc_params,
    enc_cfg,
    token_ids: jax.Array,  # [N, L]
    token_mask: jax.Array,
    *,
    batch_size: int = 64,
    dtype=jnp.float32,
    mesh=None,
) -> jax.Array:
    """CLS-embed the whole corpus in fixed-size batches (the reference's
    `encode_text2` datasets.map pass, sotasum/mips.py:226-244 — without the
    per-rank Arrow shards: one jitted function, batch-sharded over the
    mesh)."""
    n, L = token_ids.shape
    pad = (-n) % batch_size
    if pad:
        token_ids = jnp.concatenate(
            [token_ids, jnp.tile(token_ids[:1], (pad, 1))], 0
        )
        token_mask = jnp.concatenate(
            [token_mask, jnp.tile(token_mask[:1], (pad, 1))], 0
        )

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        if batch_size % mesh.shape[DATA_AXIS] == 0:
            sharding = NamedSharding(mesh, P(DATA_AXIS, None))

    @jax.jit
    def enc(ids, mask):
        hid = longformer_encode(enc_params, enc_cfg, ids, mask, dtype=dtype)
        return hid[:, 0].astype(jnp.float32)

    outs = []
    for i in range(0, token_ids.shape[0], batch_size):
        ids = token_ids[i : i + batch_size]
        mask = token_mask[i : i + batch_size]
        if sharding is not None:
            # data-parallel corpus embed over the mesh (replaces the
            # reference's rank-chunked encode_text2, mips.py:226-244)
            ids = jax.device_put(ids, sharding)
            mask = jax.device_put(mask, sharding)
        outs.append(enc(ids, mask))
    return jnp.concatenate(outs, axis=0)[:n]


def build_memory_store(
    params,
    model_cfg: RAGConfig,
    index_cfg,
    *,
    token_ids: jax.Array,
    token_mask: jax.Array,
    row_aids=None,
    mesh=None,
    seed: int = 0,
    compute_dtype=jnp.float32,
    batch_size: int | None = None,
) -> MemoryStore:
    """THE memory-store build path: embed the tokenized corpus under the
    current mips encoder and build the configured index. The initial
    build (cli.build_store) and the train-time refresh (refresh_store)
    both land here, so precision/factory/train_size cannot drift between
    them — a refresh is bit-identical to a fresh build under equal params
    (reference rebuild protocol, SURVEY.md §3.2).

    ``index_cfg`` is duck-typed (utils.config.IndexConfig or any object
    with factory/metric/normalize/nprobe/train_size/dtype)."""
    from ..index import build_index_from_factory

    idx_dtype = index_cfg.dtype
    if idx_dtype == "bfloat16":
        idx_dtype = jnp.bfloat16
    elif idx_dtype in ("float32", "f32"):
        idx_dtype = jnp.float32
    # "int8" passes through: build_flat_index SQ-quantizes the payload
    emb = encode_corpus(
        params["mips_encoder"], model_cfg.mips_enc, token_ids, token_mask,
        batch_size=batch_size or min(64, token_ids.shape[0]),
        dtype=compute_dtype, mesh=mesh,
    )
    index = build_index_from_factory(
        emb, index_cfg.factory, metric=index_cfg.metric,
        normalize=index_cfg.normalize, dtype=idx_dtype, mesh=mesh,
        train_size=index_cfg.train_size, seed=seed,
    )
    return MemoryStore(
        index=index, token_ids=token_ids, token_mask=token_mask,
        row_aids=row_aids, nprobe=index_cfg.nprobe,
    )


def _index_cfg_from_store(store: MemoryStore):
    """Reconstruct the factory knobs an existing store was built with, so
    a refresh without an explicit IndexConfig still routes through
    build_memory_store with equal settings."""
    import types

    from ..index.flat import FlatIndex

    idx = store.index
    if isinstance(idx, FlatIndex):
        factory = "Flat"
        dtype = (
            "int8" if idx.row_scale is not None else str(idx.embeddings.dtype)
        )
    else:
        payload = "SQ8" if idx.clustered_scale is not None else "Flat"
        factory = f"IVF{idx.n_clusters},{payload}"
        dtype = str(idx.clustered.dtype)
    return types.SimpleNamespace(
        factory=factory, metric=idx.metric, normalize=idx.normalized,
        nprobe=store.nprobe, train_size=None, dtype=dtype,
    )


def refresh_store(
    params,
    cfg: RAGConfig,
    store: MemoryStore,
    *,
    index_cfg=None,
    mesh=None,
    batch_size: int = 64,
    dtype=jnp.float32,
    seed: int = 0,
) -> MemoryStore:
    """Rebuild the index under the current mips encoder weights — the
    whole of SURVEY.md §3.2 as one function. Returns the NEW buffer; the
    caller swaps pointers (double buffering). Delegates to
    build_memory_store (the cli.build_store path); pass ``index_cfg`` to
    pin factory/train_size explicitly, else they are recovered from the
    existing store."""
    n = store.index.n
    new = build_memory_store(
        params, cfg, index_cfg or _index_cfg_from_store(store),
        token_ids=store.token_ids[:n], token_mask=store.token_mask[:n],
        row_aids=store.row_aids, mesh=mesh, seed=seed,
        compute_dtype=dtype, batch_size=batch_size,
    )
    # keep the ORIGINAL (possibly padded) token arrays: the swapped-in
    # store must be shape-identical to the old one or the jitted train
    # step would recompile on the pointer swap
    return MemoryStore(
        index=new.index, token_ids=store.token_ids,
        token_mask=store.token_mask, row_aids=store.row_aids,
        nprobe=store.nprobe,
    )
