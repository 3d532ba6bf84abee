#!/usr/bin/env python
"""Headline benchmark: MIPS queries/sec/chip vs CPU flat baseline.

Mirrors BASELINE.json: recall@10 parity with flat search at equal memory,
queries/sec/chip vs CPU FAISS-flat (stand-in: native/cpu_mips.cpp, since
FAISS is not in the image), and index build time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing notes: under the axon tunnel, per-dispatch RPC latency is ~30 ms and
`block_until_ready` does not fence remote execution — so the TPU benchmark
loops the search inside one jitted `lax.scan` (input perturbed per
iteration to defeat memoization) and fences by fetching a scalar.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.ops import mips_topk
    from retrieval_augmented_mds_tpu.utils.cpu_baseline import cpu_mips_search

    on_tpu = jax.default_backend() == "tpu"
    # off-TPU the kernel runs in interpret mode — keep the corpus tiny so
    # the benchmark still terminates (numbers are then not meaningful)
    N, D, B, K = (131072, 768, 256, 10) if on_tpu else (2048, 64, 16, 10)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    ej = jnp.asarray(corpus, dtype=jnp.bfloat16 if on_tpu else jnp.float32)

    # --- recall@10 parity vs CPU flat truth ------------------------------
    _, idx_cpu = cpu_mips_search(corpus, queries[:32], K)
    _, idx_tpu = mips_topk(jnp.asarray(queries[:32]), ej, K)
    idx_tpu = np.asarray(idx_tpu)
    recall = sum(
        len(set(idx_tpu[i]) & set(idx_cpu[i])) for i in range(32)
    ) / (32 * K)

    # --- CPU baseline q/s (subset, extrapolation-free rate) --------------
    t0 = time.perf_counter()
    cpu_mips_search(corpus, queries[:16], K)
    cpu_qps = 16 / (time.perf_counter() - t0)

    # --- TPU q/s via in-jit scan -----------------------------------------
    def harness(T):
        @jax.jit
        def many(q, e):
            def body(c, i):
                v, ix = mips_topk(q + i.astype(jnp.float32) * 1e-6, e, K)
                return c + v[0, 0] + ix.astype(jnp.float32)[0, 0], None
            return jax.lax.scan(body, 0.0, jnp.arange(T))[0]
        return many

    def timed(T):
        f = harness(T)
        q0 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        float(f(q0, ej))  # compile + drain
        best = 1e9
        for _ in range(2):
            q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
            float(q[0, :8].sum())  # drain H2D
            t0 = time.perf_counter()
            float(f(q, ej))
            best = min(best, time.perf_counter() - t0)
        return best

    t8, t32 = timed(8), timed(32)
    per_batch = max((t32 - t8) / 24, 1e-9)
    tpu_qps = B / per_batch

    out = {
        "metric": "mips_queries_per_sec_per_chip",
        "value": round(tpu_qps, 1),
        "unit": "queries/s (N=131072, D=768, k=10, B=256, recall@10=%.3f)"
        % recall,
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
