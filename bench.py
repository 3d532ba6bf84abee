#!/usr/bin/env python
"""Headline benchmark: MIPS queries/sec/chip vs CPU flat baseline, plus
the other two BASELINE.md targets — index build time (embed + cluster)
and N=1M `IVF1024,SQ8` serving-kernel throughput.

Mirrors BASELINE.json: recall@10 parity with flat search at equal memory,
queries/sec/chip vs CPU FAISS-flat (stand-in: native/cpu_mips.cpp, since
FAISS is not in the image), and index build time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

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
    del ej

    # --- BASELINE.md targets 2+3: build time + IVF1024,SQ8 serving -------
    extras = bench_build_and_serving(on_tpu)

    out = {
        "metric": "mips_queries_per_sec_per_chip",
        "value": round(tpu_qps, 1),
        "unit": "queries/s (N=131072, D=768, k=10, B=256, recall@10=%.3f)"
        % recall,
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
        "extras": extras,
    }
    print(json.dumps(out))


def bench_build_and_serving(on_tpu):
    """Index build time (cluster train + invlist pack; cold = incl.
    compile, warm = the steady-state train-time refresh cost) and the
    per-query DMA serving kernel's qps at N=1M `IVF1024,SQ8`, nprobe=32,
    B=4 serving shapes — certifying BASELINE.md rows 2-3. The corpus-embed
    half of "build" is reported as docs/s of the mips CLS encoder at
    memory_len=512 (longformer-base geometry)."""
    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import (
        build_flat_index,
        build_ivf_index,
        search,
    )
    from retrieval_augmented_mds_tpu.index.ivf_serving import (
        ivf_search_serving,
    )

    if on_tpu:
        N2, D2, C, NPROBE, B2, K2 = 1_048_576, 768, 1024, 32, 4, 10
    else:
        N2, D2, C, NPROBE, B2, K2 = 8192, 128, 32, 4, 4, 10

    # clustered corpus generated ON DEVICE (3 GB H2D through the tunnel
    # is slower than the whole benchmark; mixture, not isotropic — see
    # cli.run_bench_index)
    kc, ka, kn, kq, kp = jax.random.split(jax.random.PRNGKey(0), 5)

    @jax.jit
    def gen_corpus():
        centers = 3.0 * jax.random.normal(kc, (C, D2), jnp.float32)
        assign = jax.random.randint(ka, (N2,), 0, C)
        x = centers[assign] + jax.random.normal(kn, (N2, D2), jnp.float32)
        qi = jax.random.randint(kq, (B2,), 0, N2)
        q = x[qi] + 0.1 * jax.random.normal(kp, (B2, D2), jnp.float32)
        return x, q

    x, q = gen_corpus()
    q.block_until_ready()

    def build():
        t0 = time.perf_counter()
        ivf = build_ivf_index(x, n_clusters=C, dtype="int8",
                              train_size=min(N2, 65536), iters=8)
        jax.block_until_ready(ivf.clustered)
        return ivf, time.perf_counter() - t0

    _, cold_s = build()
    ivf, warm_s = build()

    # serving latency: scan-differenced (dispatch constants cancelled)
    def scan_timer(fn, q0, index, t_short=8, t_long=32):
        def harness(T):
            @jax.jit
            def many(qq, idx):
                def body(c, i):
                    v, ix = fn(idx, qq + i.astype(jnp.float32) * 1e-6)
                    return c + v[0, 0] + ix.astype(jnp.float32)[0, 0], None
                return jax.lax.scan(body, 0.0, jnp.arange(T))[0]
            return many

        def timed(T):
            f = harness(T)
            float(f(q0, index))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(q0, index))
                best = min(best, time.perf_counter() - t0)
            return best

        ts, tl = timed(t_short), timed(t_long)
        return max((tl - ts) / (t_long - t_short), 1e-9)

    serve_s = scan_timer(
        lambda idx, qq: ivf_search_serving(idx, qq, k=K2, nprobe=NPROBE),
        q, ivf,
    )
    _, ids_s = ivf_search_serving(ivf, q, k=K2, nprobe=NPROBE)

    # recall vs exact truth on the same corpus
    truth = build_flat_index(x, dtype=jnp.bfloat16)
    _, ref_ids = search(truth, q, k=K2)
    ids_s, ref_ids = np.asarray(ids_s), np.asarray(ref_ids)
    ivf_recall = sum(
        len(set(ids_s[i]) & set(ref_ids[i])) for i in range(B2)
    ) / (B2 * K2)
    del truth, x

    # embed half of "build": mips-encoder CLS docs/s at corpus shapes
    embed_docs_s = bench_embed_rate(on_tpu)

    return {
        "ivf_factory": f"IVF{C},SQ8",
        "ivf_n": N2,
        "ivf_build_cold_s": round(cold_s, 2),
        "ivf_build_warm_s": round(warm_s, 2),
        "ivf_serving_qps": round(B2 / serve_s, 1),
        "ivf_serving_ms": round(serve_s * 1e3, 3),
        "ivf_serving_nprobe": NPROBE,
        "ivf_serving_recall@10": round(ivf_recall, 4),
        "embed_docs_per_s": embed_docs_s,
    }


def bench_embed_rate(on_tpu):
    """CLS corpus-embed throughput (the embed half of index build):
    longformer-base geometry at memory_len=512, the reference's
    memory-doc tokenization length (config/no_mips.yaml:126)."""
    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.models.config import EncoderConfig
    from retrieval_augmented_mds_tpu.models.longformer import (
        init_longformer,
        longformer_encode,
    )

    if on_tpu:
        cfg, L, B = EncoderConfig.longformer_base(), 512, 64
    else:
        cfg, L, B = EncoderConfig.tiny(), 64, 8

    params = init_longformer(jax.random.PRNGKey(0), cfg)
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    def harness(T):
        @jax.jit
        def many(p, ids, mask):
            def body(c, i):
                h = longformer_encode(
                    p, cfg, ids + i.astype(jnp.int32) % 7, mask,
                    dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                )
                return c + h[0, 0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, 0.0, jnp.arange(T))[0]
        return many

    def timed(T):
        f = harness(T)
        float(f(params, ids, mask))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(f(params, ids, mask))
            best = min(best, time.perf_counter() - t0)
        return best

    t2, t8 = timed(2), timed(8)
    per_batch = max((t8 - t2) / 6, 1e-9)
    return round(B / per_batch, 1)


if __name__ == "__main__":
    sys.exit(main())
