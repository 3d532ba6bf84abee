"""On-hardware parity: Pallas kernel grads vs the XLA composite oracle.

The pytest suites prove the kernels in interpret mode on CPU; this tool
re-proves them on the real chip at production-like shapes (bf16 inputs,
LED window 512), where the Mosaic compiler — not the interpreter —
executes the kernels. Compares forward outputs and all input grads of
`sliding_local_rows` and `dense_rows` against RAMDS_FORCE_XLA_OPS=1
(the composite path) in the same process via the `_force_xla` env knob.

Usage: python tools/check_kernel_parity_tpu.py  (exits nonzero on FAIL)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: needs the TPU backend")
        return

    from retrieval_augmented_mds_tpu.ops import flash_dense, flash_sliding

    results = {}

    # --- sliding (LED encoder shape, scaled-down batch) -----------------
    b, nh, t, dh, w, g = 1, 4, 2048, 64, 512, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (b, nh, t, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, nh, t, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, nh, t, dh), jnp.bfloat16)
    kg = jax.random.normal(ks[3], (b, nh, g, dh), jnp.bfloat16)
    vg = jax.random.normal(ks[4], (b, nh, g, dh), jnp.bfloat16)
    key_bias = jnp.where(
        jnp.arange(t)[None] < t - 128, 0.0, -1e9
    ).astype(jnp.float32).repeat(b, 0)
    g_bias = jnp.zeros((b, g), jnp.float32)

    def loss_sliding(q, k, v, kg, vg):
        out = flash_sliding.sliding_local_rows(
            q, k, v, key_bias, kg, vg, g_bias, w
        )
        return jnp.sum((out.astype(jnp.float32)) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_sliding, argnums=(0, 1, 2, 3, 4)))
    lk, gk = jax.device_get(grad_fn(q, k, v, kg, vg))
    os.environ["RAMDS_FORCE_XLA_OPS"] = "1"
    lx, gx = jax.device_get(
        jax.jit(jax.value_and_grad(loss_sliding, argnums=(0, 1, 2, 3, 4)))(
            q, k, v, kg, vg
        )
    )
    del os.environ["RAMDS_FORCE_XLA_OPS"]
    results["sliding_loss"] = _rel_err(lk, lx)
    for name, a, bb in zip(["dq", "dk", "dv", "dkg", "dvg"], gk, gx):
        results[f"sliding_{name}"] = _rel_err(a, bb)

    # --- dense single-pass (decoder cross, S=2048) and blocked (S=8192) -
    for tag, s_len in (("dense", 2048), ("blocked", 8192)):
        td = 256
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        qd = jax.random.normal(ks[0], (1, 4, td, dh), jnp.bfloat16)
        kd = jax.random.normal(ks[1], (1, 4, s_len, dh), jnp.bfloat16)
        vd = jax.random.normal(ks[2], (1, 4, s_len, dh), jnp.bfloat16)
        kbd = jnp.where(
            jnp.arange(s_len)[None] < s_len - 128, 0.0, -1e9
        ).astype(jnp.float32)

        def loss_dense(q_, k_, v_):
            out = flash_dense.dense_rows(q_, k_, v_, kbd, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gf = jax.jit(jax.value_and_grad(loss_dense, argnums=(0, 1, 2)))
        lk, gk = jax.device_get(gf(qd, kd, vd))
        os.environ["RAMDS_FORCE_XLA_OPS"] = "1"
        lx, gx = jax.device_get(
            jax.jit(jax.value_and_grad(loss_dense, argnums=(0, 1, 2)))(
                qd, kd, vd
            )
        )
        del os.environ["RAMDS_FORCE_XLA_OPS"]
        results[f"{tag}_loss"] = _rel_err(lk, lx)
        for name, a, bb in zip(["dq", "dk", "dv"], gk, gx):
            results[f"{tag}_{name}"] = _rel_err(a, bb)

    worst = max(results.values())
    ok = worst < 3e-2  # bf16 inputs: kernel and composite round differently
    for k_, v_ in sorted(results.items()):
        print(f"{k_:>16}: rel_err {v_:.2e}")
    print(("PASS" if ok else "FAIL") + f" (worst {worst:.2e})")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
