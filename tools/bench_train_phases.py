"""Per-phase breakdown of the RAG train step (VERDICT r2 next-item #1).

Times each phase of the flagship train step in isolation on the real
chip with the scan-difference recipe (CLAUDE.md: loop inside one jitted
lax.scan with per-iteration input perturbation, fence on a scalar,
difference two scan lengths to cancel dispatch constants):

  * query_encode      — Longformer over [B, 512] queries
  * mips_search       — fused flat kernel over the bench corpus
  * memory_encode_x1  — ONE shared re-encode of [B, k, L_mem] retrieved
                        rows (memory_model_fixed=True path)
  * memory_encode_x2  — the reference-faithful TWO re-encodes
                        (mips_encoder + memory_encoder,
                        sotasum/mips.py:465-496)
  * led_encode        — main LED encoder over [B, S]
  * decode_copy       — LED decoder + copy head + mixture over [B, T]
  * fwd_loss          — whole forward + loss
  * led_encode_bwd    — fwd+bwd of the LED encoder (all-param grads)
  * decode_copy_bwd   — fwd+bwd of decoder+copy (grads wrt params+enc_out)
  * fwd_loss_bwd      — whole forward + loss + full grad (no optimizer)
  * opt_update        — optimizer alone (adamw update + apply) on grads
  * train_step        — full fwd+bwd+optimizer (both encoder modes)

Backward phases reduce EVERY grad leaf into the fenced scalar so XLA
cannot dead-code-eliminate any branch of the vjp.

Writes artifacts/train_phase_breakdown.json with --save.

Usage: python tools/bench_train_phases.py [--batch 2] [--src 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_diff(make_fn, *args, t_short=4, t_long=16, reps=4):
    """make_fn(T) -> jitted fn(*args, shift) returning a scalar; returns
    per-iteration seconds."""

    def timed(T):
        f = make_fn(T)
        out = float(f(*args, 0))  # compile + drain
        assert np.isfinite(out), out
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            float(f(*args, r + 1))
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
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated phase subset (split slow "
                    "compiles across invocations)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import build_flat_index
    from retrieval_augmented_mds_tpu.index.flat import search as flat_search
    from retrieval_augmented_mds_tpu.models.config import (
        EncoderConfig,
        Seq2SeqConfig,
    )
    from retrieval_augmented_mds_tpu.models.led import (
        led_encode,
        shift_tokens_right,
    )
    from retrieval_augmented_mds_tpu.models.longformer import (
        init_longformer,
        longformer_encode,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        MemoryStore,
        RAGConfig,
        init_rag,
        rag_decode,
        rag_encode,
        rag_forward,
    )
    from retrieval_augmented_mds_tpu.train.loss import summarization_loss
    from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer
    from retrieval_augmented_mds_tpu.train.trainer import (
        TrainHyper,
        TrainState,
        make_train_step,
    )

    led = Seq2SeqConfig.led_base()
    enc = EncoderConfig(n_layers=2)
    cfg = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                    mips_topk=args.mem_k, memory_len=args.mem_len,
                    memory_model_fixed=True)
    cfg_sep = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                        mips_topk=args.mem_k, memory_len=args.mem_len,
                        memory_model_fixed=False)
    params_sep = init_rag(jax.random.PRNGKey(0), cfg_sep)
    params = {k: v for k, v in params_sep.items() if k != "memory_encoder"}

    rng = np.random.default_rng(0)
    n_corpus = 8192
    h = enc.d_model
    dtype = jnp.bfloat16
    emb = rng.standard_normal((n_corpus, h)).astype(np.float32)
    mem_tok = rng.integers(
        4, enc.vocab_size, (n_corpus, args.mem_len)
    ).astype(np.int32)
    store = MemoryStore(
        index=build_flat_index(emb, dtype=dtype),
        token_ids=jnp.asarray(mem_tok),
        token_mask=jnp.ones_like(jnp.asarray(mem_tok)),
    )

    b, s, t, k, L = args.batch, args.src, args.tgt, args.mem_k, args.mem_len
    v = led.vocab_size
    labels = jnp.asarray(rng.integers(4, v - 2, (b, t)), jnp.int32)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, v - 2, (b, s)), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "query_input_ids": jnp.asarray(
            rng.integers(4, enc.vocab_size, (b, 512)), jnp.int32
        ),
        "query_attention_mask": jnp.ones((b, 512), jnp.int32),
        "labels": labels,
        "decoder_input_ids": shift_tokens_right(labels, led.pad_id,
                                                led.bos_id),
    }

    records = {}
    want = set(args.only.split(",")) if args.only else None

    def on(name):
        return want is None or name in want

    # -- query encode ------------------------------------------------------
    if on("query_encode"):
        def mk(T):
            @jax.jit
            def f(p, ids, mask, shift):
                def body(c, i):
                    out = longformer_encode(
                        p, enc, jnp.roll(ids, shift + i, axis=1), mask,
                        dtype=dtype,
                    )
                    return c + out[0, 0, 0].astype(jnp.float32), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["query_encode_ms"] = round(scan_diff(
            mk, params["query_encoder"], batch["query_input_ids"],
            batch["query_attention_mask"],
        ) * 1e3, 3)

    # -- search ------------------------------------------------------------
    if on("mips_search"):
        q0 = jnp.asarray(rng.standard_normal((b, h)), jnp.float32)

        def mk(T):
            @jax.jit
            def f(index, q, shift):
                def body(c, i):
                    vals, _ = flat_search(index, q + 1e-6 * (shift + i), k=k)
                    return c + vals[0, 0], None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["mips_search_ms"] = round(
            scan_diff(mk, store.index, q0) * 1e3, 3
        )

    # -- memory re-encode x1 / x2 -----------------------------------------
    mem_ids = jnp.asarray(mem_tok[: b * k].reshape(b, k, L))
    mem_mask = jnp.ones_like(mem_ids)

    def mk_mem(n_enc):
        def mk(T):
            @jax.jit
            def f(p1, p2, ids, mask, shift):
                def body(c, i):
                    rolled = jnp.roll(ids, shift + i, axis=2)
                    flat_i = rolled.reshape(b * k, L)
                    flat_m = mask.reshape(b * k, L)
                    out = longformer_encode(p1, enc, flat_i, flat_m,
                                            dtype=dtype)
                    acc = out[0, 0, 0].astype(jnp.float32)
                    if n_enc == 2:
                        out2 = longformer_encode(p2, enc, flat_i, flat_m,
                                                 dtype=dtype)
                        acc = acc + out2[0, 0, 0].astype(jnp.float32)
                    return c + acc, None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        return mk

    p2 = params_sep["memory_encoder"]
    if on("memory_encode_x1"):
        records["memory_encode_x1_ms"] = round(scan_diff(
            mk_mem(1), params["mips_encoder"], p2, mem_ids, mem_mask
        ) * 1e3, 3)
    if on("memory_encode_x2"):
        records["memory_encode_x2_ms"] = round(scan_diff(
            mk_mem(2), params["mips_encoder"], p2, mem_ids, mem_mask
        ) * 1e3, 3)

    # -- LED encode --------------------------------------------------------
    if on("led_encode"):
        gmask = jnp.zeros((b, s), jnp.int32).at[:, 0].set(1)

        def mk(T):
            @jax.jit
            def f(p, ids, mask, g, shift):
                def body(c, i):
                    out = led_encode(p, led, jnp.roll(ids, shift + i, axis=1),
                                     mask, g, dtype=dtype)
                    return c + out[0, 0, 0].astype(jnp.float32), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["led_encode_ms"] = round(scan_diff(
            mk, params["led"], batch["input_ids"], batch["attention_mask"],
            gmask,
        ) * 1e3, 3)

    # -- decode + copy -----------------------------------------------------
    if on("decode_copy"):
        enc_out = jax.jit(
            lambda p, st, bt: rag_encode(p, cfg, st, bt, dtype=dtype)
        )(params, store, batch)
        jax.block_until_ready(enc_out.enc_hidden)

        def mk(T):
            @jax.jit
            def f(p, eo, dec, shift):
                def body(c, i):
                    out, _, _ = rag_decode(
                        p, cfg, eo, jnp.roll(dec, shift + i, axis=1),
                        dtype=dtype,
                    )
                    return c + out[0, 0, 0].astype(jnp.float32), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["decode_copy_ms"] = round(scan_diff(
            mk, params, enc_out, batch["decoder_input_ids"]
        ) * 1e3, 3)

    # -- full forward + loss ----------------------------------------------
    if on("fwd_loss"):
        def mk(T):
            @jax.jit
            def f(p, st, bt, shift):
                def body(c, i):
                    b2 = dict(bt)
                    b2["input_ids"] = jnp.roll(bt["input_ids"], shift + i,
                                               axis=1)
                    out, _, _ = rag_forward(p, cfg, st, b2, dtype=dtype)
                    loss = summarization_loss(
                        out, bt["labels"], 0.1, led.pad_id
                    )
                    return c + loss, None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["fwd_loss_ms"] = round(
            scan_diff(mk, params, store, batch) * 1e3, 3
        )

    # -- backward phases ----------------------------------------------------
    # Each reduces EVERY grad leaf into the fenced scalar (tree-sum) so no
    # branch of the vjp is dead-code-eliminated.
    def tree_sum(tr):
        return sum(
            jnp.sum(x).astype(jnp.float32)
            for x in jax.tree_util.tree_leaves(tr)
        )

    if on("led_encode_bwd"):
        gmask = jnp.zeros((b, s), jnp.int32).at[:, 0].set(1)

        def mk(T):
            @jax.jit
            def f(p, ids, mask, g, shift):
                def body(c, i):
                    def loss_fn(pp):
                        out = led_encode(
                            pp, led, jnp.roll(ids, shift + i, axis=1),
                            mask, g, dtype=dtype,
                        )
                        return jnp.sum(out).astype(jnp.float32)

                    l, grads = jax.value_and_grad(loss_fn)(p)
                    return c + l + tree_sum(grads), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["led_encode_bwd_ms"] = round(scan_diff(
            mk, params["led"], batch["input_ids"], batch["attention_mask"],
            gmask,
        ) * 1e3, 3)

    if on("decode_copy_bwd"):
        enc_out = jax.jit(
            lambda p, st, bt: rag_encode(p, cfg, st, bt, dtype=dtype)
        )(params, store, batch)
        jax.block_until_ready(enc_out.enc_hidden)

        import dataclasses as _dc

        def mk(T):
            @jax.jit
            def f(p, eo, dec, shift):
                def body(c, i):
                    # grads flow to params AND to the float activations
                    # (enc_hidden/memory) — matching what the real bwd
                    # propagates into the encoder — but not to int leaves
                    # (masks, copy_seq, retrieved_idx), which jax.grad
                    # rejects.
                    def loss_fn(pp, hid, mem):
                        ee = _dc.replace(eo, enc_hidden=hid, memory=mem)
                        out, _, _ = rag_decode(
                            pp, cfg, ee, jnp.roll(dec, shift + i, axis=1),
                            dtype=dtype,
                        )
                        return jnp.sum(out).astype(jnp.float32)

                    l, grads = jax.value_and_grad(
                        loss_fn, argnums=(0, 1, 2)
                    )(p, eo.enc_hidden, eo.memory)
                    return c + l + tree_sum(grads), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["decode_copy_bwd_ms"] = round(scan_diff(
            mk, params, enc_out, batch["decoder_input_ids"]
        ) * 1e3, 3)

    if on("fwd_loss_bwd"):
        def mk(T):
            @jax.jit
            def f(p, st, bt, shift):
                def body(c, i):
                    def loss_fn(pp):
                        b2 = dict(bt)
                        b2["input_ids"] = jnp.roll(
                            bt["input_ids"], shift + i, axis=1
                        )
                        out, _, _ = rag_forward(pp, cfg, st, b2, dtype=dtype)
                        return summarization_loss(
                            out, bt["labels"], 0.1, led.pad_id
                        )

                    l, grads = jax.value_and_grad(loss_fn)(p)
                    return c + l + tree_sum(grads), None

                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

            return f

        records["fwd_loss_bwd_ms"] = round(
            scan_diff(mk, params, store, batch) * 1e3, 3
        )

    if on("opt_update"):
        hyper0 = TrainHyper(lr=3e-5, warmup_steps=10, total_steps=1000)
        tx0 = build_optimizer(hyper0.lr, hyper0.warmup_steps,
                              hyper0.total_steps)
        state0 = TrainState.create(
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
            tx0,
        )
        grads0 = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 1e-4), params
        )

        import optax

        def mk(T):
            @jax.jit
            def f(st, gr, shift):
                def body(s_, i):
                    g2 = jax.tree_util.tree_map(
                        lambda g: g * (1.0 + 1e-6 * (shift + i)), gr
                    )
                    updates, opt_state = tx0.update(
                        g2, s_.opt_state, s_.params
                    )
                    new_params = optax.apply_updates(s_.params, updates)
                    s_ = TrainState(params=new_params, opt_state=opt_state,
                                    step=s_.step + 1)
                    return s_, None

                s_fin, _ = jax.lax.scan(body, st, jnp.arange(T))
                return tree_sum(
                    jax.tree_util.tree_map(
                        lambda x: jnp.ravel(x)[0], s_fin.params
                    )
                )

            return f

        records["opt_update_ms"] = round(
            scan_diff(mk, state0, grads0) * 1e3, 3
        )

    # -- full train step, both encoder modes ------------------------------
    hyper = TrainHyper(lr=3e-5, warmup_steps=10, total_steps=1000)

    def bench_step(c, p):
        tx = build_optimizer(hyper.lr, hyper.warmup_steps, hyper.total_steps)
        step = make_train_step(c, tx, hyper, dtype=dtype)
        state = TrainState.create(
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p), tx
        )

        def mk(T):
            @jax.jit
            def f(st, store_, bt, shift):
                def body(s_, i):
                    b2 = dict(bt)
                    b2["input_ids"] = jnp.roll(bt["input_ids"], shift + i,
                                               axis=1)
                    s_, m = step(s_, store_, b2, None)
                    return s_, m["loss"]

                _, losses = jax.lax.scan(body, st, jnp.arange(T))
                return losses[-1]

            return f

        return scan_diff(mk, state, store, batch)

    if on("train_step_fixed"):
        records["train_step_fixed_ms"] = round(
            bench_step(cfg, params) * 1e3, 3
        )
    if on("train_step_separate"):
        records["train_step_separate_ms"] = round(
            bench_step(cfg_sep, params_sep) * 1e3, 3
        )

    import jax as _jax

    out = {
        "bench": "train_phase_breakdown",
        "batch": b, "src": s, "tgt": t, "mem_k": k, "mem_len": L,
        "backend": _jax.default_backend(),
        **records,
    }
    print(json.dumps(out))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        path = "artifacts/train_phase_breakdown.json"
        prev = {}
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
        prev.update(out)
        with open(path, "w") as f:
            json.dump(prev, f, indent=1)


if __name__ == "__main__":
    main()
