"""Baseline seq2seq fine-tuning (BART / T5).

Rebuilds the reference baselines' training surface
(sotasum/bart_lightning.py:94-124: shift-right → forward → CE with label
smoothing; sotasum/t5_lightning.py:93-124 with `_shift_right` and the
"summarize: " prompt prep living in the data module) as jitted steps over
the pure-JAX model families.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.bart import bart_decode, bart_encode, bart_lm_logits
from ..models.config import Seq2SeqConfig
from ..models.led import shift_tokens_right
from ..models.t5 import t5_decode, t5_encode, t5_lm_logits, t5_shift_right
from .loss import summarization_loss
from .trainer import TrainState


def _family(name: str, cfg: Seq2SeqConfig):
    if name == "bart":
        return (
            bart_encode,
            bart_decode,
            lambda p, h: bart_lm_logits(p, h),
            lambda ids: shift_tokens_right(ids, cfg.pad_id, cfg.eos_id),
        )
    if name == "t5":
        return (
            t5_encode,
            t5_decode,
            lambda p, h: t5_lm_logits(p, h, cfg),
            lambda ids: t5_shift_right(ids, cfg.pad_id, 0),
        )
    raise ValueError(name)


def make_seq2seq_train_step(
    family: str,
    cfg: Seq2SeqConfig,
    tx: optax.GradientTransformation,
    label_smoothing_eps: float = 0.1,
    dtype=jnp.float32,
) -> Callable:
    encode, decode, lm_logits, shift = _family(family, cfg)

    def loss_fn(params, batch):
        enc = encode(params, cfg, batch["input_ids"],
                     batch["attention_mask"], dtype=dtype)
        dec_ids = shift(batch["labels"])
        hid, _ = decode(params, cfg, dec_ids, enc, batch["attention_mask"])
        logp = jax.nn.log_softmax(lm_logits(params, hid), axis=-1)
        loss = summarization_loss(
            logp, batch["labels"], label_smoothing_eps, cfg.pad_id
        )
        return loss, {"loss": loss}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return step


def seq2seq_greedy(
    family: str,
    params,
    cfg: Seq2SeqConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    max_new_tokens: int = 32,
    decoder_start_id: int | None = None,
) -> jax.Array:
    """Greedy generation for the baselines (validation ROUGE loop,
    reference bart_lightning.py:126-196)."""
    from ..models.core import make_cache

    encode, decode, lm_logits, _ = _family(family, cfg)
    start = decoder_start_id
    if start is None:
        start = cfg.eos_id if family == "bart" else 0

    b = input_ids.shape[0]
    enc = encode(params, cfg, input_ids, attention_mask)
    dh = cfg.d_model // cfg.n_heads
    caches = [
        make_cache(b, cfg.n_heads, dh, max_new_tokens + 1, enc.dtype)
        for _ in range(cfg.dec_layers)
    ]
    seqs0 = jnp.full((b, max_new_tokens + 1), cfg.pad_id, jnp.int32)
    seqs0 = seqs0.at[:, 0].set(start)

    def body(carry, t):
        seqs, caches, done = carry
        tok = jnp.take_along_axis(seqs, t[None, None], axis=1)
        hid, caches = decode(params, cfg, tok, enc, attention_mask,
                             caches=caches)
        logits = lm_logits(params, hid)[:, 0]
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_id, nxt)
        seqs = seqs.at[:, t + 1].set(nxt)
        return (seqs, caches, done | (nxt == cfg.eos_id)), None

    (seqs, _, _), _ = jax.lax.scan(
        body, (seqs0, caches, jnp.zeros((b,), bool)),
        jnp.arange(max_new_tokens),
    )
    return seqs[:, 1:]
