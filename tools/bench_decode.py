"""Decode-step microbenchmark: per-token latency of beam/greedy generate.

Measures the serving hot loop at LED-base shapes (the reference's beam
search, sotasum/lightning_model.py:298-325) on the real TPU, using the
scan-difference recipe from CLAUDE.md: jit generate at two max_new_tokens
lengths, fence with a scalar fetch, and difference to cancel dispatch and
encode constants.

Usage: python tools/bench_decode.py [--beams 4] [--batch 2] [--src 2048]
Writes a JSON line; append to artifacts/decode_bench.jsonl for evidence.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beams", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--src", type=int, default=2048)
    ap.add_argument("--mem-k", type=int, default=2)
    ap.add_argument("--mem-len", type=int, default=512)
    ap.add_argument("--t-short", type=int, default=8)
    ap.add_argument("--t-long", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.models.config import (
        EncoderConfig,
        Seq2SeqConfig,
    )
    from retrieval_augmented_mds_tpu.models.generate import (
        GenerationOptions,
        generate,
    )
    from retrieval_augmented_mds_tpu.models.retriever_generator import (
        RAGConfig,
        RAGEncoderOutput,
        init_rag,
    )

    if args.tiny:
        cfg = RAGConfig.tiny()
        args.src = min(args.src, 128)
        args.mem_len = 32
    else:
        # LED-base geometry (reference model_name allenai/led-base-16384)
        led = Seq2SeqConfig(
            vocab_size=50272, d_model=768, enc_layers=6, dec_layers=6,
            n_heads=12, d_ffn=3072, max_src_len=16384, max_tgt_len=1024,
            window=512,
        )
        enc = EncoderConfig(
            vocab_size=50272, d_model=768, n_layers=2, n_heads=12,
            d_ffn=3072, max_len=4096, window=256,
        )
        cfg = RAGConfig(led=led, query_enc=enc, mips_enc=enc, memory_enc=enc,
                        mips_topk=args.mem_k, memory_len=args.mem_len)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = init_rag(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, s = args.batch, args.src
    h = cfg.led.d_model
    m = args.mem_k * args.mem_len if not args.tiny else cfg.mips_topk * 32

    # synthetic encoder output (decode cost is independent of its content)
    enc_out = RAGEncoderOutput(
        enc_hidden=jnp.asarray(
            rng.standard_normal((b, s, h)), dtype
        ),
        enc_mask=jnp.ones((b, s), jnp.int32),
        memory=jnp.asarray(rng.standard_normal((b, m, h)), dtype),
        memory_mask=jnp.ones((b, m), jnp.int32),
        memory_bias=jnp.asarray(rng.standard_normal((b, m)), jnp.float32),
        copy_seq=jnp.asarray(
            rng.integers(4, cfg.led.vocab_size - 2, (b, m)), jnp.int32
        ),
        mips_scores=None,
        retrieved_idx=None,
    )

    def run(t_new):
        opts = GenerationOptions(
            max_new_tokens=t_new, num_beams=args.beams,
            no_repeat_ngram_size=3, length_penalty=1.0,
        )
        fn = jax.jit(
            functools.partial(generate, cfg=cfg, opts=opts, dtype=dtype)
        )
        out = fn(params, enc_out=enc_out)
        _ = int(out[0, 0])  # scalar fence (block_until_ready is unreliable
        # through the axon tunnel, CLAUDE.md)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(params, enc_out=enc_out)
            _ = int(out[0, 0])
            times.append(time.perf_counter() - t0)
        return min(times)

    t_short = run(args.t_short)
    t_long = run(args.t_long)
    per_step_ms = (t_long - t_short) / (args.t_long - args.t_short) * 1e3
    rec = {
        "bench": "decode_step",
        "beams": args.beams,
        "batch": b,
        "src": s,
        "memory": m,
        "dtype": args.dtype,
        "per_step_ms": round(per_step_ms, 3),
        "t_short_s": round(t_short, 4),
        "t_long_s": round(t_long, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
