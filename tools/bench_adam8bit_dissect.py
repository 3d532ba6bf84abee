"""Dissect the superleaf 8-bit Adam update: kernel vs glue vs layout.

The r5 sweep measured the production 8-bit path at 26.4 ms = 4.48x its
traffic-model roofline at 162M params (artifacts/opt_update_bench.jsonl)
— slower than the bf16-mu chain it exists to beat (6.37 ms). This tool
times the phases in isolation to localize the gap:

  * kernel      — ONE adam8bit_superleaf_update call on pre-blocked
                  superarrays (g2 perturbed in-loop; no concat/split).
  * composite   — the XLA oracle on the same superarrays (fused=False
                  path of train/adam8bit.py), same isolation.
  * concat      — _concat_blocks over the 250-leaf tree + scalar fetch.
  * split_apply — _split_updates + optax.apply_updates from a fixed
                  superleaf update array.
  * e2e         — the full production tx.update (cross-check vs the
                  sweep's 26.4 ms).

Each phase scan-differenced (CLAUDE.md recipe). --tile-rows sweeps the
kernel grid tile. Run AFTER the r5 sweep (one chip, one core).

Usage: python tools/bench_adam8bit_dissect.py [--params-m 162]
       [--tile-rows 256 1024] [--phases kernel composite] [--save]
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


def make_params(params_m: float, n_leaves: int):
    import jax.numpy as jnp

    n_total = int(params_m * 1e6)
    n_big = max(1, n_leaves // 10)
    big_each = (n_total * 9 // 10) // n_big
    n_small = n_leaves - n_big
    small_each = max(128, (n_total // 10) // max(1, n_small))
    rng = np.random.default_rng(0)
    params = {}
    for i in range(n_big):
        params[f"big_{i}"] = jnp.asarray(
            rng.standard_normal(big_each), jnp.float32)
    for i in range(n_small):
        params[f"small_{i}"] = jnp.asarray(
            rng.standard_normal(small_each), jnp.float32)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params-m", type=float, default=162.0)
    ap.add_argument("--n-leaves", type=int, default=250)
    ap.add_argument("--tile-rows", type=int, nargs="+", default=[1024])
    ap.add_argument("--phases", nargs="+", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.params_m, args.n_leaves = 0.5, 8

    import jax.numpy as jnp
    import optax

    from retrieval_augmented_mds_tpu.train import adam8bit as a8
    from retrieval_augmented_mds_tpu.ops.adam8bit_update import (
        adam8bit_superleaf_update,
    )

    params = make_params(args.params_m, args.n_leaves)
    real_total = sum(x.size for x in params.values())
    leaves = jax.tree_util.tree_leaves(params)
    sizes, nbs, _, nb = a8._layout(leaves, 1)
    print(f"params={real_total} leaves={len(leaves)} NB={nb}", flush=True)

    # pre-blocked state (one warm update so moments are non-trivial)
    tx = a8.adamw8bit(1e-4, grad_clip=0.1, fused=False)
    state = tx.init(params)
    g0 = jax.tree_util.tree_map(lambda x: x * 1e-3, params)
    _, state = jax.jit(tx.update)(g0, state, params)
    g2 = jax.jit(a8._concat_blocks, static_argnums=1)(leaves, nb)
    state = jax.block_until_ready(state)

    kw = dict(b1=0.9, b2=0.999, eps=1e-8, wd=0.0, out_dtype=jnp.float32,
              tiny=a8._TINY, log_tiny=a8._LOG_TINY, log_range=a8._LOG_RANGE)
    scal = jnp.asarray([[0.1, 0.001, 1e-4, 1.0]], jnp.float32)

    results = {}

    def want(name):
        return args.phases is None or name in args.phases

    # roofline refs (GB moved / 890 GB/s)
    kern_gb = real_total * (4 + 1.1 + 1.1 + 4 + 1.1 + 1.1) / 1e9
    if want("kernel"):
        for tr in args.tile_rows:
            @functools.partial(jax.jit, static_argnums=0)
            def run_k(T, g2, st, _tr=tr):
                def body(carry, i):
                    g, mq, ms, nq, nlo, nhi = carry
                    gi = g * (1.0 + 1e-4 * i.astype(jnp.float32))
                    upd, mq2, ms2, nq2, nlo2, nhi2 = (
                        adam8bit_superleaf_update(
                            gi, mq, ms, nq, nlo, nhi, st.nvalid, gi, scal,
                            tile_rows=_tr, **kw))
                    # feed the update back into g so nothing is dead
                    return (upd, mq2, ms2, nq2, nlo2, nhi2), None

                c, _ = jax.lax.scan(
                    body,
                    (g2, st.mu_q, st.mu_scale, st.nu_q, st.nu_lo, st.nu_hi),
                    jnp.arange(T))
                return c[0][0, 0]

            sec = scan_diff(run_k, g2, state)
            ms = sec * 1e3
            roof = kern_gb / V5E_HBM_GBS * 1e3
            results[f"kernel_tr{tr}"] = {
                "ms": round(ms, 3), "roofline_ms": round(roof, 3),
                "x_roofline": round(ms / roof, 2)}
            print(f"kernel tile_rows={tr}", results[f"kernel_tr{tr}"],
                  flush=True)

    if want("composite"):
        @functools.partial(jax.jit, static_argnums=0)
        def run_c(T, g2, st):
            # iota built INSIDE jit: a concrete [NB,128] operand would be a
            # 650 MB constant payload (remote compile server rejects, 413)
            lane = jax.lax.broadcasted_iota(jnp.int32, (nb, a8.BLOCK), 1)
            mask = lane < st.nvalid

            def body(carry, i):
                g, mq, ms, nq, nlo, nhi = carry
                gi = g * (1.0 + 1e-4 * i.astype(jnp.float32))
                mu = 0.9 * a8.dequantize_mu(mq, ms) + 0.1 * gi
                nu = 0.999 * a8.dequantize_nu(nq, nlo, nhi) + 1e-3 * gi * gi
                step = (mu / 0.1) / (jnp.sqrt(nu / 0.001) + 1e-8)
                upd = -1e-4 * step
                mq2, ms2 = a8.quantize_mu(mu, mask)
                nq2, nlo2, nhi2 = a8.quantize_nu(nu, mask)
                return (upd, mq2, ms2, nq2, nlo2, nhi2), None

            c, _ = jax.lax.scan(
                body,
                (g2, st.mu_q, st.mu_scale, st.nu_q, st.nu_lo, st.nu_hi),
                jnp.arange(T))
            return c[0][0, 0]

        sec = scan_diff(run_c, g2, state)
        ms = sec * 1e3
        roof = kern_gb / V5E_HBM_GBS * 1e3
        results["composite"] = {
            "ms": round(ms, 3), "roofline_ms": round(roof, 3),
            "x_roofline": round(ms / roof, 2)}
        print("composite", results["composite"], flush=True)

    if want("concat"):
        @functools.partial(jax.jit, static_argnums=0)
        def run_cc(T, p):
            def body(carry, i):
                f = 1e-3 * (1.0 + 0.01 * i.astype(jnp.float32))
                g = jax.tree_util.tree_map(lambda x: x * f, p)
                g2 = a8._concat_blocks(jax.tree_util.tree_leaves(g), nb)
                gnorm = jnp.sqrt(jnp.sum(g2 * g2))
                return carry + gnorm, None

            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(T))
            return c

        sec = scan_diff(run_cc, params)
        ms = sec * 1e3
        roof = real_total * (4 + 4 + 4) / 1e9 / V5E_HBM_GBS * 1e3
        results["concat_norm"] = {
            "ms": round(ms, 3), "roofline_ms": round(roof, 3),
            "x_roofline": round(ms / roof, 2)}
        print("concat_norm", results["concat_norm"], flush=True)

    if want("split_apply"):
        @functools.partial(jax.jit, static_argnums=0)
        def run_sa(T, p, upd):
            def body(carry, i):
                pp = carry
                u = upd * (1.0 + 1e-4 * i.astype(jnp.float32))
                upds = a8._split_updates(u, jax.tree_util.tree_leaves(pp),
                                         nbs)
                tree = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(pp), upds)
                return optax.apply_updates(pp, tree), None

            c, _ = jax.lax.scan(body, p, jnp.arange(T))
            return jax.tree_util.tree_leaves(c)[0][0]

        sec = scan_diff(run_sa, params, g2)
        ms = sec * 1e3
        roof = real_total * (4 + 4 + 4 + 4) / 1e9 / V5E_HBM_GBS * 1e3
        results["split_apply"] = {
            "ms": round(ms, 3), "roofline_ms": round(roof, 3),
            "x_roofline": round(ms / roof, 2)}
        print("split_apply", results["split_apply"], flush=True)

    if want("e2e"):
        txf = a8.adamw8bit(1e-4, grad_clip=0.1, fused=True)
        st0 = txf.init(params)

        @functools.partial(jax.jit, static_argnums=0)
        def run_e(T, p0, s0):
            def body(carry, i):
                p, s = carry
                f = 1e-3 * (1.0 + 0.01 * i.astype(jnp.float32))
                g = jax.tree_util.tree_map(lambda x: x * f, p)
                u, s2 = txf.update(g, s, p)
                return (optax.apply_updates(p, u), s2), None

            (p, s), _ = jax.lax.scan(body, (p0, s0), jnp.arange(T))
            return jax.tree_util.tree_leaves(p)[0][0]

        sec = scan_diff(run_e, params, st0)
        results["e2e"] = {"ms": round(sec * 1e3, 3)}
        print("e2e", results["e2e"], flush=True)

    rec = {"bench": "adam8bit_dissect", "params": real_total,
           "n_leaves": len(leaves), "backend": jax.default_backend(),
           "phases": results}
    print(json.dumps(rec))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/adam8bit_dissect.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
