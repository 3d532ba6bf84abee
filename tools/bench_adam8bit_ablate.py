"""Ablate the superleaf 8-bit Adam kernel to find the 8.3x-roofline gap.

bench_adam8bit_dissect measured the production kernel ALONE at 18.7 ms
vs a 2.26 ms HBM roofline at 162M params, invariant to tile size — so
the kernel is VPU-compute-bound, not DMA/launch-bound. Candidate costs,
each ablated here with a throwaway kernel variant (same streams, same
traffic; numerics intentionally bogus for all but `full`):

  * full      — the production math (baseline; expect ~18.7 ms).
  * noquant   — requant removed (moments passed through): drops the 3
                cross-lane reductions, log2, rounds, clips.
  * notrans   — exp2/log2 replaced by a multiply: transcendental cost.
  * nored     — per-block reductions replaced by constant scales:
                cross-lane reduce cost (keeps rounds/packs/log2).
  * noint8    — moments streamed/stored as bf16, no quant math at all:
                the int8 pack/unpack + quant-total cost (traffic rises
                ~1.6x; roofline reported accordingly).

Usage: python tools/bench_adam8bit_ablate.py [--params-m 162]
       [--variants full noquant ...] [--save]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 890.0
BLOCK = 128


def scan_diff(fn, *args, t_short=4, t_long=16, reps=3):
    def run(T):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(T, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    run(t_short)
    run(t_long)
    return (run(t_long) - run(t_short)) / (t_long - t_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params-m", type=float, default=162.0)
    ap.add_argument("--tile-rows", type=int, default=1024)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "noquant", "notrans", "nored",
                             "noint8"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.params_m = 0.5

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from retrieval_augmented_mds_tpu.train import adam8bit as a8

    n = int(args.params_m * 1e6)
    nb = -(-n // BLOCK)
    r = min(args.tile_rows, max(8, (nb // 8) * 8))

    # generate operands ON DEVICE: a ~1 GB host->device transfer over the
    # axon tunnel takes many minutes and dominates the run otherwise
    @jax.jit
    def make_data():
        k = jax.random.split(jax.random.PRNGKey(0), 4)
        g2 = jax.random.normal(k[0], (nb, BLOCK), jnp.float32)
        mq = jax.random.randint(k[1], (nb, BLOCK), -127, 127, jnp.int32
                                ).astype(jnp.int8)
        ms = jax.random.uniform(k[2], (nb, 1), jnp.float32) * 1e-3
        nq = jax.random.randint(k[3], (nb, BLOCK), 0, 255, jnp.int32
                                ).astype(jnp.uint8)
        nlo = jnp.full((nb, 1), -30.0, jnp.float32)
        nhi = jnp.full((nb, 1), -5.0, jnp.float32)
        nv = jnp.full((nb, 1), BLOCK, jnp.int32)
        mub = (mq.astype(jnp.float32) * ms).astype(jnp.bfloat16)
        nub = jnp.exp2(nlo + nq.astype(jnp.float32) / 255.0 * (nhi - nlo))
        return g2, mq, ms, nq, nlo, nhi, nv, mub, nub.astype(jnp.bfloat16)

    g2, mq, ms, nq, nlo, nhi, nv, mub, nub = jax.block_until_ready(
        make_data())
    print("data ready on device", flush=True)

    b1, b2, eps = 0.9, 0.999, 1e-8
    bc1, bc2, lr = 0.1, 0.001, 1e-4
    interp = jax.default_backend() != "tpu"

    row = pl.BlockSpec((r, BLOCK), lambda i: (i, 0))
    col = pl.BlockSpec((r, 1), lambda i: (i, 0))
    grid = (-(-nb // r),)

    def quant_kernel(mode):
        def k(g_ref, mq_ref, ms_ref, nq_ref, nlo_ref, nhi_ref, nv_ref,
              upd_ref, mq2_ref, ms2_ref, nq2_ref, nlo2_ref, nhi2_ref):
            g = g_ref[...].astype(jnp.float32)
            mq_f = mq_ref[...].astype(jnp.int32).astype(jnp.float32)
            mu = b1 * (mq_f * ms_ref[...]) + (1.0 - b1) * g
            rng0 = jnp.maximum(nhi_ref[...] - nlo_ref[...], 1e-6)
            nq_f = nq_ref[...].astype(jnp.int32).astype(jnp.float32)
            code = nlo_ref[...] + nq_f / 255.0 * rng0
            if mode == "notrans":
                nu_prev = code * 1e-3  # stand-in for exp2
            else:
                nu_prev = jnp.exp2(code)
            nu = b2 * nu_prev + (1.0 - b2) * g * g
            step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            upd_ref[...] = (-lr * step).astype(jnp.float32)

            if mode == "noquant":
                mq2_ref[...] = mq_ref[...]
                ms2_ref[...] = ms_ref[...]
                nq2_ref[...] = nq_ref[...]
                nlo2_ref[...] = nlo_ref[...]
                nhi2_ref[...] = nhi_ref[...]
                return

            lane = jax.lax.broadcasted_iota(jnp.int32, (r, BLOCK), 1)
            mask = lane < nv_ref[...]
            if mode == "nored":
                scale = ms_ref[...] + 1e-9  # constant per-block scales
                lo = nlo_ref[...]
                hi = nhi_ref[...]
            else:
                absmax = jnp.max(jnp.abs(jnp.where(mask, mu, 0.0)),
                                 axis=1, keepdims=True)
                scale = absmax / 127.0
            safe = jnp.where(scale > 0, scale, 1.0)
            mq2_ref[...] = (jnp.clip(jnp.round(mu / safe), -127, 127)
                            .astype(jnp.int32).astype(jnp.int8))
            ms2_ref[...] = scale

            if mode == "notrans":
                log = nu * 1e3  # stand-in for log2
            else:
                log = jnp.log2(jnp.maximum(nu, a8._TINY))
            log = jnp.where(mask, log, a8._LOG_TINY)
            if mode != "nored":
                hi = jnp.max(jnp.where(mask, log, -jnp.inf), axis=1,
                             keepdims=True)
                hi = jnp.maximum(hi, a8._LOG_TINY)
                lo = jnp.min(jnp.where(mask, log, jnp.inf), axis=1,
                             keepdims=True)
                lo = jnp.clip(lo, hi - a8._LOG_RANGE, hi)
            rng1 = jnp.maximum(hi - lo, 1e-6)
            q = jnp.round(jnp.clip((log - lo) / rng1, 0.0, 1.0) * 255.0)
            nq2_ref[...] = q.astype(jnp.int32).astype(jnp.uint8)
            nlo2_ref[...] = lo
            nhi2_ref[...] = hi

        return k

    def call_quant(mode, gi, mq, ms, nq, nlo, nhi):
        return pl.pallas_call(
            quant_kernel(mode), grid=grid,
            in_specs=[row, row, col, row, col, col, col],
            out_specs=[row, row, col, row, col, col],
            out_shape=[
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.int8),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.uint8),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
                jax.ShapeDtypeStruct((nb, 1), jnp.float32),
            ],
            interpret=interp,
        )(gi, mq, ms, nq, nlo, nhi, nv)

    def bf16_kernel(g_ref, mu_ref, nu_ref, upd_ref, mu2_ref, nu2_ref):
        g = g_ref[...].astype(jnp.float32)
        mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
        nu = b2 * nu_ref[...].astype(jnp.float32) + (1.0 - b2) * g * g
        step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        upd_ref[...] = (-lr * step).astype(jnp.float32)
        mu2_ref[...] = mu.astype(jnp.bfloat16)
        nu2_ref[...] = nu.astype(jnp.bfloat16)

    def call_bf16(gi, mu, nu):
        return pl.pallas_call(
            bf16_kernel, grid=grid,
            in_specs=[row, row, row],
            out_specs=[row, row, row],
            out_shape=[
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.bfloat16),
                jax.ShapeDtypeStruct((nb, BLOCK), jnp.bfloat16),
            ],
            interpret=interp,
        )(gi, mu, nu)

    results = {}
    for mode in args.variants:
        if mode == "noint8":
            @functools.partial(jax.jit, static_argnums=0)
            def run(T, g2, mu, nu):
                def body(carry, i):
                    g, m, v = carry
                    gi = g * (1.0 + 1e-4 * i.astype(jnp.float32))
                    upd, m2, v2 = call_bf16(gi, m, v)
                    return (upd, m2, v2), None

                c, _ = jax.lax.scan(body, (g2, mu, nu), jnp.arange(T))
                return c[0][0, 0]

            sec = scan_diff(run, g2, mub, nub)
            gb = n * (4 + 2 + 2 + 4 + 2 + 2) / 1e9
        else:
            @functools.partial(jax.jit, static_argnums=0)
            def run(T, g2, mq, ms, nq, nlo, nhi, _m=mode):
                def body(carry, i):
                    g, a, b_, c_, d, e = carry
                    gi = g * (1.0 + 1e-4 * i.astype(jnp.float32))
                    out = call_quant(_m, gi, a, b_, c_, d, e)
                    return tuple(out), None

                c, _ = jax.lax.scan(
                    body, (g2, mq, ms, nq, nlo, nhi), jnp.arange(T))
                return c[0][0, 0]

            sec = scan_diff(run, g2, mq, ms, nq, nlo, nhi)
            gb = n * (4 + 1.1 + 1.1 + 4 + 1.1 + 1.1) / 1e9
        ms_t = sec * 1e3
        roof = gb / V5E_HBM_GBS * 1e3
        results[mode] = {"ms": round(ms_t, 3), "roofline_ms": round(roof, 3),
                         "x_roofline": round(ms_t / roof, 2)}
        print(mode, results[mode], flush=True)

    rec = {"bench": "adam8bit_ablate", "params": n,
           "backend": jax.default_backend(), "tile_rows": r,
           "variants": results}
    print(json.dumps(rec))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/adam8bit_dissect.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
