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
import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12


def _scan_diff_encoder(enc_fn, led_params, ids, mask, gmask,
                       t_short=2, t_long=6, reps=3):
    """Per-call seconds via the CLAUDE.md axon recipe: loop the forward
    inside one jitted lax.scan (per-iteration token roll defeats both CSE
    and tunnel memoization), fence on a scalar, and difference two scan
    lengths to cancel the ~30 ms per-dispatch RPC constant."""
    import jax
    import jax.numpy as jnp

    def make(T):
        @jax.jit
        def multi(p, i0, m, g, shift):
            def body(c, i):
                out = enc_fn(p, jnp.roll(i0, shift + i, axis=1), m, g)
                return c + out[0, 0, 0].astype(jnp.float32), None

            return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

        return multi

    def timed(T):
        f = make(T)
        float(f(led_params, ids, mask, gmask, 0))  # compile + drain
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            float(f(led_params, ids, mask, gmask, r + 1))
            best = min(best, time.perf_counter() - t0)
        return best

    ts, tl = timed(t_short), timed(t_long)
    return max((tl - ts) / (t_long - t_short), 1e-9)


def _scan_diff_train_step(step, state, store, batch,
                          t_short=2, t_long=6, reps=3):
    """Same recipe for the train step: scan the (inlined) jitted step so a
    whole T-step chain is one dispatch; params/opt-state change every
    iteration so nothing folds. ``shift`` rolls the tokens per rep to
    defeat tunnel memoization of identical top-level executions."""
    import jax
    import jax.numpy as jnp

    def make(T):
        @jax.jit
        def multi(st, store_, batch_, shift):
            def body(s, i):
                b2 = dict(batch_)
                b2["input_ids"] = jnp.roll(
                    batch_["input_ids"], shift + i, axis=1
                )
                s, m = step(s, store_, b2, None)
                return s, m["loss"]

            _, losses = jax.lax.scan(body, st, jnp.arange(T))
            return losses[-1]

        return multi

    def timed(T):
        f = make(T)
        ls = float(f(state, store, batch, 0))  # compile + drain
        assert np.isfinite(ls)
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            float(f(state, store, batch, r + 1))
            best = min(best, time.perf_counter() - t0)
        return best

    ts, tl = timed(t_short), timed(t_long)
    return max((tl - ts) / (t_long - t_short), 1e-9)


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
    ap.add_argument("--remat", nargs="?", const=True, default=False,
                    help="per-layer gradient checkpointing in the step: "
                    "bare flag = full remat, or a jax.checkpoint_policies "
                    "name (e.g. dots_with_no_batch_dims_saveable)")
    ap.add_argument("--separate-mem", action="store_true",
                    help="memory_model_fixed=False: reference-faithful "
                    "separate memory encoder (two re-encodes per step) "
                    "instead of the shared-encoder default")
    ap.add_argument("--adam8bit", action="store_true",
                    help="blockwise 8-bit Adam state (train/adam8bit.py)")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--skip-train", action="store_true",
                    help="measure only the encoder (split slow compiles "
                    "across invocations)")
    ap.add_argument("--skip-composite-flops", action="store_true",
                    help="skip the second (kernel-free) lowering used to "
                    "count Pallas flops; report xla_flops-based MFU only")
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

    fixed = not args.separate_mem
    if args.tiny:
        cfg = RAGConfig.tiny(memory_model_fixed=fixed)
        args.src, args.tgt, args.mem_len = 128, 32, 32
        n_corpus = 64
    else:
        led = Seq2SeqConfig.led_base()
        enc = EncoderConfig(n_layers=2)  # memory/query towers as benched r1
        cfg = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                        mips_topk=args.mem_k, memory_len=args.mem_len,
                        memory_model_fixed=fixed)
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
    tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps,
                         state_8bit=args.adam8bit)
    state = TrainState.create(params, tx)
    step = make_train_step(cfg, tx, hyper, dtype=jnp.bfloat16,
                           remat=args.remat)

    records = []
    # enc16k FIRST: the train step donates `state` (and with it `params`),
    # so the encoder must be measured before the buffers are consumed.
    # params go in as a jit ARG, not a closure constant (the remote compile
    # server rejects large constant payloads).
    if args.enc16k and not args.tiny:
        s16 = 16384
        ids16 = jnp.asarray(rng.integers(4, v - 2, (1, s16)), jnp.int32)
        mask16 = jnp.ones((1, s16), jnp.int32)
        gmask = jnp.zeros((1, s16), jnp.int32).at[:, 0].set(1)

        @jax.jit
        def enc_fn(p, i, m, g):
            return led_encode(p, cfg.led, i, m, g, dtype=jnp.bfloat16)

        low = enc_fn.lower(params["led"], ids16, mask16, gmask)
        ca2 = low.compile().cost_analysis()
        ca2 = ca2[0] if isinstance(ca2, (list, tuple)) else ca2
        f2 = float(ca2.get("flops", 0.0))
        t2 = _scan_diff_encoder(enc_fn, params["led"], ids16, mask16, gmask)
        records.append({
            "bench": "led_encoder_16k_fwd",
            "step_ms": round(t2 * 1e3, 2),
            "xla_flops": f2,
            "mfu_pct_v5e_bf16": round(100 * f2 / t2 / V5E_PEAK_BF16, 2),
            "backend": jax.default_backend(),
            "note": "XLA cost model excludes Pallas custom-call flops; "
                    "MFU is a lower bound",
        })

    if not args.skip_train:
        def _flops_of(fn, bt):
            ca = fn.lower(state, store, bt, None).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0))

        # measure BEFORE the extra composite lowering: a compile failure
        # there (e.g. the kernel-free step OOMs at batches the kernelized
        # one fits) must not lose the timing
        t_step = _scan_diff_train_step(step, state, store, batch)

        # FLOPs from XLA's cost model for the exact compiled step. The
        # cost model reports 0 for Pallas custom calls, so also lower the
        # mathematically identical composite-only step (attention via the
        # XLA oracle, RAMDS_FORCE_XLA_OPS=1) — its flop count is the true
        # numerator for the kernelized step's timing. Every op in the
        # step is linear in batch, so if the composite step's AOT memory
        # check rejects the full batch (it materializes the [B,nh,T,S]
        # logits the kernels avoid), count flops at a smaller batch and
        # scale — exact, not an estimate.
        flops = _flops_of(step, batch)
        comp_flops = None
        comp_batch = None
        if not args.skip_composite_flops:
            os.environ["RAMDS_FORCE_XLA_OPS"] = "1"
            try:
                for bb in sorted({b, min(b, 4), min(b, 2), 1},
                                 reverse=True):
                    bt = jax.tree_util.tree_map(lambda x: x[:bb], batch)
                    try:
                        # fresh jit wrapper: the flag is read at trace
                        # time, so cached traces must not be reused
                        comp_flops = _flops_of(
                            make_train_step(cfg, tx, hyper,
                                            dtype=jnp.bfloat16),
                            bt,
                        ) * (b / bb)
                        comp_batch = bb
                        break
                    except Exception as e:  # noqa: BLE001 — try smaller b
                        print(f"# composite lowering failed at b={bb}: "
                              f"{type(e).__name__}", file=sys.stderr)
            finally:
                os.environ.pop("RAMDS_FORCE_XLA_OPS", None)

        true_flops = comp_flops if comp_flops else flops
        rec = {
            "bench": "rag_train_step",
            "batch": b, "src": s, "tgt": t,
            "memory": args.mem_k * args.mem_len,
            "memory_model_fixed": fixed,
            "remat": args.remat,
            "adam_8bit": args.adam8bit,
            "step_ms": round(t_step * 1e3, 2),
            "xla_flops": flops,
            "mfu_pct_v5e_bf16": round(
                100 * true_flops / t_step / V5E_PEAK_BF16, 2
            ),
            "backend": jax.default_backend(),
        }
        if comp_flops:
            rec["composite_flops"] = comp_flops
            rec["composite_flops_batch"] = comp_batch
            rec["note"] = ("mfu numerator = cost model of the identical "
                           "composite-only (kernel-free) step"
                           + (f", counted at b={comp_batch} and scaled "
                              "linearly" if comp_batch != b else "")
                           + "; xla_flops omits Pallas custom-call flops")
        else:
            rec["note"] = ("XLA cost model excludes Pallas custom-call "
                           "flops; MFU is a lower bound")
        records.append(rec)

    for r in records:
        print(json.dumps(r))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/mfu.jsonl", "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
