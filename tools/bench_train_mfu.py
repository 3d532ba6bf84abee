"""Train-step MFU: % of v5e bf16 peak for the flagship RAG training step.

VERDICT r1 weak-item 10: step latencies were reported without a
%-of-peak figure. This script measures the LED-base RAG train step (and
the 16k-token encoder forward) on the real chip, pulls the analytical
FLOP count from XLA's cost model (`compiled.cost_analysis()["flops"]`),
and reports MFU = flops / time / peak.

Peak: TPU v5e ≈ 197 TFLOP/s bf16 (394 TOPS int8).

Usage: python tools/bench_train_mfu.py [--batch 2] [--src 2048] [--tiny]
Appends evidence to artifacts/mfu.jsonl when --save is passed.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

V5E_PEAK_BF16 = 197e12


def _timed(fn, args, reps=4):
    out = fn(*args)
    lf = float(jax_leaf_scalar(out))  # compile + fence
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        lf = float(jax_leaf_scalar(out))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(lf)
    return best


def jax_leaf_scalar(tree):
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "ndim")]
    x = leaves[0]
    return x.reshape(-1)[0]


def _timed_train_step(step, state, store, batch, reps=4):
    """Train steps donate ``state`` — thread it through and fence on the
    loss scalar each call."""
    state, metrics = step(state, store, batch, None)
    assert np.isfinite(float(metrics["loss"]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = step(state, store, batch, None)
        _ = float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--src", type=int, default=2048)
    ap.add_argument("--tgt", type=int, default=256)
    ap.add_argument("--mem-k", type=int, default=2)
    ap.add_argument("--mem-len", type=int, default=512)
    ap.add_argument("--enc16k", action="store_true",
                    help="also measure the 16k-token encoder forward")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import build_flat_index
    from retrieval_augmented_mds_tpu.models.config import (
        EncoderConfig,
        Seq2SeqConfig,
    )
    from retrieval_augmented_mds_tpu.models.led import (
        led_encode,
        shift_tokens_right,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        MemoryStore,
        RAGConfig,
        init_rag,
    )
    from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
    from retrieval_augmented_mds_tpu.train.trainer import (
        TrainHyper,
        TrainState,
        make_train_step,
    )

    if args.tiny:
        cfg = RAGConfig.tiny()
        args.src, args.tgt, args.mem_len = 128, 32, 32
        n_corpus = 64
    else:
        led = Seq2SeqConfig.led_base()
        enc = EncoderConfig(n_layers=2)  # memory/query towers as benched r1
        cfg = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                        mips_topk=args.mem_k, memory_len=args.mem_len)
        n_corpus = 8192

    params = init_rag(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    h = cfg.query_enc.d_model
    emb = rng.standard_normal((n_corpus, h)).astype(np.float32)
    ids = rng.integers(
        4, cfg.mips_enc.vocab_size, (n_corpus, args.mem_len)
    ).astype(np.int32)
    store = MemoryStore(
        index=build_flat_index(emb, dtype=jnp.bfloat16),
        token_ids=jnp.asarray(ids),
        token_mask=jnp.ones_like(jnp.asarray(ids)),
    )

    b, s, t = args.batch, args.src, args.tgt
    v = cfg.led.vocab_size
    labels = jnp.asarray(rng.integers(4, v - 2, (b, t)), jnp.int32)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, v - 2, (b, s)), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "query_input_ids": jnp.asarray(
            rng.integers(4, cfg.query_enc.vocab_size, (b, 512)), jnp.int32
        ),
        "query_attention_mask": jnp.ones((b, 512), jnp.int32),
        "labels": labels,
        "decoder_input_ids": shift_tokens_right(
            labels, cfg.led.pad_id, cfg.led.bos_id
        ),
    }

    hyper = TrainHyper(lr=3e-5, warmup_steps=10, total_steps=1000)
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps)
    state = TrainState.create(params, tx)
    step = make_train_step(cfg, tx, hyper, dtype=jnp.bfloat16)

    # FLOPs from XLA's cost model for the exact compiled step
    compiled = step.lower(state, store, batch, None).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))

    t_step = _timed_train_step(step, state, store, batch)

    records = []
    mfu = flops / t_step / V5E_PEAK_BF16
    records.append({
        "bench": "rag_train_step",
        "batch": b, "src": s, "tgt": t,
        "memory": args.mem_k * args.mem_len,
        "step_ms": round(t_step * 1e3, 2),
        "xla_flops": flops,
        "mfu_pct_v5e_bf16": round(100 * mfu, 2),
        "backend": jax.default_backend(),
    })

    if args.enc16k and not args.tiny:
        s16 = 16384
        ids16 = jnp.asarray(rng.integers(4, v - 2, (1, s16)), jnp.int32)
        mask16 = jnp.ones((1, s16), jnp.int32)
        gmask = jnp.zeros((1, s16), jnp.int32).at[:, 0].set(1)
        enc_fn = jax.jit(functools.partial(
            led_encode, params["led"], cfg.led, dtype=jnp.bfloat16
        ))
        low = enc_fn.lower(ids16, mask16, gmask)
        ca2 = low.compile().cost_analysis()
        ca2 = ca2[0] if isinstance(ca2, (list, tuple)) else ca2
        f2 = float(ca2.get("flops", 0.0))
        t2 = _timed(enc_fn, (ids16, mask16, gmask))
        records.append({
            "bench": "led_encoder_16k_fwd",
            "step_ms": round(t2 * 1e3, 2),
            "xla_flops": f2,
            "mfu_pct_v5e_bf16": round(100 * f2 / t2 / V5E_PEAK_BF16, 2),
            "backend": jax.default_backend(),
        })

    for r in records:
        print(json.dumps(r))
    if args.save:
        import os

        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/mfu.jsonl", "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
