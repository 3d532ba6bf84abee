"""Optimizer-update roofline probe: where do the ~10.6 ms go?

The RAG train step's optimizer phase (clip-by-global-norm + AdamW with
bf16 mu) measured 10.6 ms at LED-base scale (artifacts/
train_phase_breakdown.json) against a ~5 ms HBM roofline estimate
(norm pass reads g; update reads g,p,mu,nu and writes p,mu,nu ≈ 4.5 GB
@ 890 GB/s). This tool times the update in isolation on real-size
params and dissects the gap with variants:

  * full      — clip + adamw (the production chain)
  * noclip    — adamw only (is the extra grads pass / reduction the gap?)
  * f32mu     — clip + adamw with f32 mu (reference-faithful state)
  * bf16grads — grads cast to bf16 before the chain (halves g traffic;
                numerics experiment, NOT production)
  * 8bit      — clip + blockwise 8-bit adamw (train/adam8bit.py):
                int8 mu + log2-affine uint8 nu, production option
                (train.adam_8bit)

Timing: scan-difference recipe (CLAUDE.md) — the update loops inside one
jitted lax.scan with a per-iteration grad perturbation, fenced on a
scalar; two scan lengths difference away dispatch constants.

Usage: python tools/bench_opt_update.py [--params-m 162] [--save]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 890.0


def scan_diff(fn, *args, t_short=4, t_long=16, reps=3):
    import jax

    def run(T):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(T, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(t_short)  # compile both lengths first
    run(t_long)
    return (run(t_long) - run(t_short)) / (t_long - t_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params-m", type=float, default=162.0,
                    help="model size in millions of f32 params")
    ap.add_argument("--n-leaves", type=int, default=250,
                    help="split the params into this many leaves "
                    "(LED-base has ~250)")
    ap.add_argument("--align128", action="store_true",
                    help="round leaf sizes to multiples of 128 (real "
                    "transformer leaves are; isolates the blocked-layout "
                    "pad-copy cost from kernel-launch cost)")
    ap.add_argument("--only", nargs="+", default=None,
                    help="run only these variants (e.g. --only 8bit)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.params_m, args.n_leaves = 0.5, 8

    import jax.numpy as jnp
    import optax

    from retrieval_augmented_mds_tpu.train.optimizer import build_optimizer

    n_total = int(args.params_m * 1e6)
    # leaf size mix roughly like a transformer: a few big (embeddings,
    # ffn), many small (layernorms, biases)
    n_big = max(1, args.n_leaves // 10)
    big_each = (n_total * 9 // 10) // n_big
    n_small = args.n_leaves - n_big
    small_each = max(128, (n_total // 10) // max(1, n_small))
    if args.align128:
        big_each -= big_each % 128
        small_each -= small_each % 128
    rng = np.random.default_rng(0)
    params = {}
    for i in range(n_big):
        params[f"big_{i}"] = jnp.asarray(
            rng.standard_normal(big_each), jnp.float32)
    for i in range(n_small):
        params[f"small_{i}"] = jnp.asarray(
            rng.standard_normal(small_each), jnp.float32)
    real_total = sum(x.size for x in params.values())

    variants = {
        "full": dict(grad_clip=0.1, mu_dtype="bfloat16", bf16_grads=False),
        "noclip": dict(grad_clip=None, mu_dtype="bfloat16",
                       bf16_grads=False),
        "f32mu": dict(grad_clip=0.1, mu_dtype=None, bf16_grads=False),
        "bf16grads": dict(grad_clip=0.1, mu_dtype="bfloat16",
                          bf16_grads=True),
        "8bit": dict(grad_clip=0.1, mu_dtype=None, bf16_grads=False,
                     state_8bit=True),
    }

    results = {}
    if args.only:
        variants = {k: v for k, v in variants.items() if k in args.only}
    for name, v in variants.items():
        tx = build_optimizer(1e-4, 10, 1000, grad_clip=v["grad_clip"],
                             mu_dtype=v["mu_dtype"],
                             state_8bit=v.get("state_8bit", False))
        opt_state = tx.init(params)

        bf16 = v["bf16_grads"]

        @functools.partial(jax.jit, static_argnums=0)
        def run(T, p0, s0, seed, _tx=tx, _bf16=bf16):
            def body(carry, i):
                p, s = carry
                # cheap per-iteration grad perturbation (defeats CSE and
                # tunnel memoization): grads = params scaled by a
                # step-dependent factor
                f = (1e-3 * (1.0 + 0.01 * i.astype(jnp.float32)))
                g = jax.tree_util.tree_map(lambda x: x * f, p)
                if _bf16:
                    g = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16).astype(x.dtype), g)
                u, s2 = _tx.update(g, s, p)
                p2 = optax.apply_updates(p, u)
                return (p2, s2), None

            (p, s), _ = jax.lax.scan(body, (p0, s0), jnp.arange(T))
            return jax.tree_util.tree_leaves(p)[0][0].astype(jnp.float32)

        sec = scan_diff(run, params, opt_state, 0)
        # traffic model: norm pass (read g) if clipped; update pass reads
        # g,p,nu (+mu) writes p,nu (+mu)
        g_b = 2 if bf16 else 4
        if v.get("state_8bit"):
            # superleaf path (train/adam8bit.py): clip rides the concat
            # (no separate norm pass), but the blocked-grads concat
            # (g r+w), the materialized f32 update (w+r), and the apply
            # pass (p r+w) are all real traffic the fused XLA paths
            # don't pay
            mu_b = nu_b = 1.1  # int8 moments + f32 scales/nvalid per 128
            traffic = real_total * (
                g_b + 4                    # concat read g, write gsuper
                + 4 + nu_b + mu_b          # kernel reads gsuper,nu,mu
                + 4 + nu_b + mu_b          # kernel writes upd,nu,mu
                + 4 + 4 + 4                # apply reads upd,p; writes p
            )
        else:
            mu_b = 2 if v["mu_dtype"] == "bfloat16" else 4
            nu_b = 4
            traffic = real_total * (
                (g_b if v["grad_clip"] else 0)  # norm pass
                + g_b + 4 + nu_b + mu_b         # update reads g,p,nu,mu
                + 4 + nu_b + mu_b               # update writes p,nu,mu
            )
        roof_ms = traffic / (V5E_HBM_GBS * 1e9) * 1e3
        results[name] = {
            "ms": round(sec * 1e3, 3),
            "roofline_ms": round(roof_ms, 3),
            "x_roofline": round(sec * 1e3 / roof_ms, 2) if roof_ms else None,
        }
        print(name, results[name], flush=True)

    rec = {
        "bench": "opt_update",
        "params": real_total,
        "n_leaves": len(params),
        "align128": bool(args.align128),
        "backend": jax.default_backend(),
        "variants": results,
        "note": "scan-differenced; grads synthesized in-loop from params "
                "(adds one params read per iter vs the traffic model)",
    }
    print(json.dumps(rec))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/opt_update_bench.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
