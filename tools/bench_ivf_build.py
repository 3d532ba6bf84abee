"""IVF cold-build latency with the persistent compile cache (VERDICT r2
next-item #8).

Round-2 measured the 1M-doc IVF1024,SQ8 build at 69 s cold,
compile-dominated (k-means + device packing executables). The CLI now
wires `compilation_cache_dir` (cli.py run-entry), so a *second* cold
process — new interpreter, warm on-disk cache — should skip XLA
compilation entirely and approach the warm-rebuild time.

This tool measures ONE cold build in THIS process; run it twice with the
same --cache-dir (two processes) and the second run's number is the
"second-cold-run" figure. With --save, appends to
artifacts/ivf_build_cache.jsonl so both runs land in one artifact.

Corpus is generated on device (host RNG + 3 GB H2D through the tunnel is
far slower than the build itself at N=1M).

Usage:
  python tools/bench_ivf_build.py --cache-dir /tmp/ramds_cc --save
  python tools/bench_ivf_build.py --cache-dir /tmp/ramds_cc --save
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--payload", default="int8",
                    choices=["int8", "bfloat16"])
    ap.add_argument("--cache-dir", default=None,
                    help="persistent XLA compile cache (same dir across "
                    "runs = second run skips compiles)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax

    cache_state = "off"
    if args.cache_dir:
        # same knobs as cli.py's run entry (cli.py:792-800)
        os.makedirs(args.cache_dir, exist_ok=True)
        pre_existing = any(os.scandir(args.cache_dir))
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        cache_state = "warm" if pre_existing else "cold"

    import jax.numpy as jnp

    from retrieval_augmented_mds_tpu.index import build_ivf_index

    if args.tiny or jax.default_backend() != "tpu":
        args.n, args.d, args.clusters = 8192, 128, 32

    kc, ka, kn = jax.random.split(jax.random.PRNGKey(0), 3)
    n_true = max(64, args.clusters)

    @jax.jit
    def gen_corpus():
        centers = 3.0 * jax.random.normal(kc, (n_true, args.d), jnp.float32)
        assign = jax.random.randint(ka, (args.n,), 0, n_true)
        return centers[assign] + jax.random.normal(
            kn, (args.n, args.d), jnp.float32
        )

    x = gen_corpus()
    x.block_until_ready()

    t0 = time.perf_counter()
    ivf = build_ivf_index(
        x, n_clusters=args.clusters, dtype=args.payload,
        train_size=min(args.n, 65536), iters=args.iters,
    )
    jax.block_until_ready(ivf.clustered)
    cold_s = round(time.perf_counter() - t0, 2)

    # steady-state rebuild in the same process (executables warm in RAM)
    t0 = time.perf_counter()
    ivf = build_ivf_index(
        x, n_clusters=args.clusters, dtype=args.payload,
        train_size=min(args.n, 65536), iters=args.iters,
    )
    jax.block_until_ready(ivf.clustered)
    warm_s = round(time.perf_counter() - t0, 2)

    rec = {
        "bench": "ivf_build",
        "n": args.n, "d": args.d, "clusters": args.clusters,
        "payload": args.payload,
        "compile_cache": cache_state,
        "build_cold_process_s": cold_s,
        "rebuild_warm_process_s": warm_s,
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/ivf_build_cache.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
