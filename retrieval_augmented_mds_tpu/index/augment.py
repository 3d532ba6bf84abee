"""MIPS→L2 φ-augmentation (compatibility / testing transform).

The reference uses the "SpeedUp" trick (Bachrach et al., theorem 5; see
sotasum/mips.py:52-70): append one column so that L2 search over the
augmented corpus is equivalent to inner-product search over the original —
needed because FAISS IVF cells train better under L2.

The TPU engine does not need the trick (the fused kernel takes a per-row
bias, so L2 and IP are the same kernel), but the transform is kept:
  * to checkpoint/import indexes in the reference's format,
  * as the oracle for the L2↔IP equivalence test (the one coherent check
    the reference ships, sotasum/mips.py:655-686).
"""

from __future__ import annotations

import jax.numpy as jnp


def corpus_phi(corpus: jnp.ndarray) -> jnp.ndarray:
    """φ = max squared norm over the corpus (sotasum/mips.py:316-331)."""
    return jnp.max(jnp.sum(corpus.astype(jnp.float32) ** 2, axis=-1))


def augment_corpus(corpus: jnp.ndarray, phi: jnp.ndarray | float | None = None):
    """Append sqrt(φ − ‖x‖²) column (reference `augment_xb`, mips.py:55-63).

    Returns (augmented [N, D+1] f32, phi).
    """
    x = corpus.astype(jnp.float32)
    norms = jnp.sum(x**2, axis=-1)
    if phi is None:
        phi = jnp.max(norms)
    extra = jnp.sqrt(jnp.maximum(phi - norms, 0.0))
    return jnp.concatenate([x, extra[:, None]], axis=-1), phi


def augment_queries(queries: jnp.ndarray):
    """Append a zero column (reference `augment_xq`, mips.py:66-70)."""
    x = queries.astype(jnp.float32)
    return jnp.concatenate([x, jnp.zeros((x.shape[0], 1), x.dtype)], axis=-1)
