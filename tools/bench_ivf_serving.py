"""Serving-shape index benchmark: flat scan vs IVF kernels at small B.

VERDICT r1 weak-item 2 / next-round item 5: make IVF win at serving
batch sizes (B ≤ 8, N ≥ 1M). Produces the flat-vs-IVF-vs-nprobe latency
+ recall table for artifacts/.

Timing uses the CLAUDE.md axon recipe: loop the search inside one jitted
`lax.scan` with per-iteration query perturbation, fence on a scalar, and
difference two scan lengths to cancel dispatch constants.

Usage:
  python tools/bench_ivf_serving.py --n 1048576 --b 4 [--tiny]
Appends JSON lines to artifacts/ivf_serving_bench.jsonl with --save.
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_timer(fn, q0, index, reps=3, t_short=8, t_long=32):
    """Per-call seconds of `fn(index, q) -> (vals, ids)` via scan
    differencing. The index is passed as a jit ARG, not closed over (the
    remote compile server rejects large constant payloads)."""
    import jax
    import jax.numpy as jnp

    def harness(T):
        @jax.jit
        def many(q, idx):
            def body(c, i):
                v, ix = fn(idx, q + i.astype(jnp.float32) * 1e-6)
                return c + v[0, 0] + ix.astype(jnp.float32)[0, 0], None

            return jax.lax.scan(body, 0.0, jnp.arange(T))[0]

        return many

    def timed(T):
        f = harness(T)
        float(f(q0, index))  # compile + drain
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(q0, index))
            best = min(best, time.perf_counter() - t0)
        return best

    ts, tl = timed(t_short), timed(t_long)
    return max((tl - ts) / (t_long - t_short), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--nprobes", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--payload", default="int8", choices=["int8", "bfloat16"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import (
        build_flat_index,
        build_ivf_index,
        ivf_search,
        search,
    )
    from retrieval_augmented_mds_tpu.index.ivf_serving import (
        ivf_search_serving,
    )

    if args.tiny or jax.default_backend() != "tpu":
        args.n, args.d, args.clusters = 8192, 128, 32
        args.nprobes = [4, 8]

    t_start = time.perf_counter()

    def note(msg):
        print(json.dumps(
            {"phase": msg, "t_s": round(time.perf_counter() - t_start, 1)}
        ), flush=True)

    # clustered corpus (real embedding sets are far from isotropic
    # Gaussian; use a mixture so IVF recall numbers mean something).
    # Generated ON DEVICE: host-side numpy RNG at N=1M×768 takes many
    # minutes on this box and the 3 GB H2D through the tunnel is worse.
    n_true = max(64, args.clusters)
    kc, ka, kn, kq, kp = jax.random.split(jax.random.PRNGKey(0), 5)

    @jax.jit
    def gen_corpus():
        centers = 3.0 * jax.random.normal(kc, (n_true, args.d), jnp.float32)
        assign = jax.random.randint(ka, (args.n,), 0, n_true)
        x = centers[assign] + jax.random.normal(
            kn, (args.n, args.d), jnp.float32
        )
        qi = jax.random.randint(kq, (args.b,), 0, args.n)
        q = x[qi] + 0.1 * jax.random.normal(kp, (args.b, args.d), jnp.float32)
        return x, q

    x, q = gen_corpus()
    q.block_until_ready()
    note("corpus generated")

    payload = jnp.int8 if args.payload == "int8" else jnp.bfloat16
    flat = build_flat_index(x, dtype=payload)
    note("flat built")
    ivf = build_ivf_index(
        x, n_clusters=args.clusters, dtype="int8" if payload == jnp.int8
        else payload, train_size=min(args.n, 65536), iters=8,
    )
    note("ivf built")

    # exact truth from the flat bf16 scan at full precision payload
    truth = build_flat_index(x, dtype=jnp.bfloat16)
    _, ref_ids = search(truth, q, k=args.k)
    ref_ids = np.asarray(ref_ids)
    note("truth ids computed")

    def recall(ids):
        ids = np.asarray(ids)
        return sum(
            len(set(ids[i]) & set(ref_ids[i])) for i in range(args.b)
        ) / (args.b * args.k)

    rows = []

    def emit(r):
        r["backend"] = jax.default_backend()
        rows.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps({"phase": "indexes built", "n": args.n}), flush=True)
    t_flat = _scan_timer(lambda ii, qq: search(ii, qq, k=args.k), q, flat)
    _, ids = search(flat, q, k=args.k)
    emit({
        "engine": "flat", "payload": args.payload, "n": args.n, "b": args.b,
        "ms": round(t_flat * 1e3, 3), "recall": round(recall(ids), 4),
    })

    for npb in args.nprobes:
        t_u = _scan_timer(
            lambda ii, qq: ivf_search(ii, qq, k=args.k, nprobe=npb), q, ivf
        )
        _, ids_u = ivf_search(ivf, q, k=args.k, nprobe=npb)
        emit({
            "engine": "ivf_union", "nprobe": npb, "n": args.n, "b": args.b,
            "ms": round(t_u * 1e3, 3), "recall": round(recall(ids_u), 4),
        })
        t_s = _scan_timer(
            lambda ii, qq: ivf_search_serving(ii, qq, k=args.k, nprobe=npb),
            q, ivf,
        )
        _, ids_s = ivf_search_serving(ivf, q, k=args.k, nprobe=npb)
        emit({
            "engine": "ivf_serving_dma", "nprobe": npb, "n": args.n,
            "b": args.b, "ms": round(t_s * 1e3, 3),
            "recall": round(recall(ids_s), 4),
        })
    if args.save:
        import os

        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/ivf_serving_bench.jsonl", "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
