"""End-to-end serving latency: one document, the FULL predict path.

What a serving user pays per request (reference predict_step,
sotasum/lightning_model.py:327-366): query Longformer encode → MIPS
top-k over the corpus → on-device gather + memory re-encode →
differentiable rescore → LED encode of the 2048-token source → beam-4
decode of max_new_tokens tokens with the copy head. All of it is ONE
jitted program here (the reference crosses the device↔host↔FAISS
boundary per request).

Timed with the scan-difference recipe over the whole eval step (encoder
+ full beam decode per iteration, inputs rolled so nothing is CSE'd or
memoized). Writes artifacts/serving_e2e.jsonl with --save.

Usage: python tools/bench_serving_e2e.py [--batch 1] [--src 2048]
       [--new-tokens 256] [--beams 4] [--corpus 131072]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--src", type=int, default=2048)
    ap.add_argument("--new-tokens", type=int, default=256)
    ap.add_argument("--beams", type=int, default=4)
    ap.add_argument("--corpus", type=int, default=131072)
    ap.add_argument("--mem-k", type=int, default=2)
    ap.add_argument("--mem-len", type=int, default=512)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        # hermetic smoke path: don't touch the axon tunnel at all
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import build_flat_index
    from retrieval_augmented_mds_tpu.models.config import (
        EncoderConfig,
        Seq2SeqConfig,
    )
    from retrieval_augmented_mds_tpu.models.generate import (
        GenerationOptions,
        generate,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        MemoryStore,
        RAGConfig,
        init_rag,
        rag_encode,
    )

    if args.tiny or jax.default_backend() != "tpu":
        args.corpus, args.src, args.new_tokens = 2048, 128, 8

    led = Seq2SeqConfig.led_base() if not args.tiny and \
        jax.default_backend() == "tpu" else Seq2SeqConfig.tiny()
    enc = (EncoderConfig(n_layers=2) if not args.tiny and
           jax.default_backend() == "tpu" else EncoderConfig.tiny())
    cfg = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                    mips_topk=args.mem_k, memory_len=args.mem_len,
                    memory_model_fixed=True)
    params = {k: v for k, v in init_rag(jax.random.PRNGKey(0), cfg).items()
              if k != "memory_encoder"}

    rng = np.random.default_rng(0)
    h = enc.d_model
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    emb = rng.standard_normal((args.corpus, h)).astype(np.float32)
    mem_tok = rng.integers(
        4, enc.vocab_size, (args.corpus, args.mem_len)
    ).astype(np.int32)
    store = MemoryStore(
        index=build_flat_index(emb, dtype=dtype),
        token_ids=jnp.asarray(mem_tok),
        token_mask=jnp.ones_like(jnp.asarray(mem_tok)),
    )

    b, s, v = args.batch, args.src, led.vocab_size
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, v - 2, (b, s)), jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "query_input_ids": jnp.asarray(
            rng.integers(4, enc.vocab_size, (b, 512)), jnp.int32
        ),
        "query_attention_mask": jnp.ones((b, 512), jnp.int32),
    }
    opts = GenerationOptions(max_new_tokens=args.new_tokens,
                             num_beams=args.beams, no_repeat_ngram_size=3)

    # One jitted program per request (the production dispatch unit).
    # Wrapping it in an outer benchmark scan makes the XLA graph
    # intractable to compile (generate already contains the decode
    # scan), so this times single dispatches: fence on a scalar, roll
    # the inputs per rep (defeats the tunnel's result memoization), and
    # report best-of — an UPPER bound that includes one ~30 ms tunnel
    # RTT that on-host serving would not pay.
    @jax.jit
    def eval_step(p, st, bt, shift):
        b2 = dict(bt)
        b2["input_ids"] = jnp.roll(bt["input_ids"], shift, axis=1)
        eo = rag_encode(p, cfg, st, b2, dtype=dtype)
        ids = generate(p, cfg, eo, opts, dtype=dtype)
        return ids.sum().astype(jnp.float32)

    out = float(eval_step(params, store, batch, 0))  # compile + drain
    assert np.isfinite(out)
    best = 1e9
    for r in range(5):
        t0 = time.perf_counter()
        float(eval_step(params, store, batch, r + 1))
        best = min(best, time.perf_counter() - t0)

    rec = {
        "bench": "serving_e2e",
        "batch": b, "src": s, "beams": args.beams,
        "new_tokens": args.new_tokens,
        "corpus": args.corpus, "memory": args.mem_k * args.mem_len,
        "e2e_ms": round(best * 1e3, 2),
        "ms_per_doc": round(best * 1e3 / b, 2),
        "backend": jax.default_backend(),
        "note": "query encode + MIPS search + memory re-encode + LED "
                "encode + beam decode, one jitted program; single-"
                "dispatch timing — includes one tunnel RTT (~30 ms), "
                "upper bound",
    }
    print(json.dumps(rec))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/serving_e2e.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
