"""Jit-compiled autoregressive generation (greedy + beam) with memory.

Replaces HF `GenerationMixin.generate` as used by the reference
(sotasum/lightning_model.py:298-325, beam expansion of memory tensors at
sotasum/retriever_generator.py:297-344, cache reorder at :346-347) with a
`lax.scan` decode loop: static shapes, KV caches updated in place, beams
laid out as a folded batch axis, and beam reordering = one gather of the
cache pytree. Supports eos stopping, min/max length, length penalty, and
no-repeat-ngram banning (GenerationConfig knobs at config/no_mips.yaml:
136-185: num_beams=4, max_new_tokens=256, no_repeat_ngram_size=3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .retriever_generator import RAGConfig, RAGEncoderOutput, rag_decode

NEG = -1.0e9


@dataclasses.dataclass(frozen=True)
class GenerationOptions:
    """The HF GenerationConfig surface the reference embeds in its YAML
    (config/no_mips.yaml:136-185): beam knobs, repetition controls, and
    the sampling family."""

    max_new_tokens: int = 64
    num_beams: int = 1
    min_length: int = 1
    no_repeat_ngram_size: int = 0
    length_penalty: float = 1.0
    decoder_start_id: int = 2  # LED/BART decoder_start_token_id
    output_copy_probs: bool = False  # per-token copy traces on predict
    early_stopping: bool = False  # freeze finished set once num_beams done
    repetition_penalty: float = 1.0  # HF RepetitionPenaltyLogitsProcessor
    do_sample: bool = False  # sampled decoding (num_beams == 1 path)
    temperature: float = 1.0
    top_k: int = 0  # 0 = disabled
    top_p: float = 1.0  # 1.0 = disabled


def _ban_repeated_ngrams(
    seqs: jax.Array,  # [B, Tmax] generated so far (pad beyond cur_len)
    cur_len: jax.Array,  # [] current length
    logp: jax.Array,  # [B, V]
    n: int,
) -> jax.Array:
    """Mask tokens that would complete an n-gram already present."""
    if n <= 0:
        return logp
    b, tmax = seqs.shape
    v = logp.shape[-1]
    # suffix = last n-1 tokens
    pos = jnp.arange(tmax)
    # window starting at i matches suffix if seqs[i:i+n-1] == suffix
    # build [B, T, n-1] windows
    idx = pos[:, None] + jnp.arange(n - 1)[None, :]  # [T, n-1]
    idx = jnp.minimum(idx, tmax - 1)
    windows = seqs[:, idx]  # [B, T, n-1]
    suffix_idx = cur_len - (n - 1) + jnp.arange(n - 1)
    suffix = seqs[:, jnp.maximum(suffix_idx, 0)]  # [B, n-1]
    match = jnp.all(windows == suffix[:, None, :], axis=-1)  # [B, T]
    # window must be fully inside history and its continuation observed
    valid = (pos[None, :] + n - 1 < cur_len) & (cur_len >= n - 1)
    match = match & valid
    cont_idx = jnp.minimum(pos + n - 1, tmax - 1)
    cont = seqs[:, cont_idx]  # [B, T] continuation token of window at i
    banned = jnp.zeros((b, v), bool)
    banned = banned.at[
        jnp.arange(b)[:, None], cont
    ].max(match)
    return jnp.where(banned, NEG, logp)


def _apply_repetition_penalty(
    seqs: jax.Array,  # [B, Tmax] generated so far (incl. start token)
    cur_len: jax.Array,  # [] current length
    logp: jax.Array,  # [B, V] logits or log-probs
    penalty: float,
) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor semantics: scores of tokens
    already generated are divided by `penalty` when positive, multiplied
    when negative (works identically on raw logits and on the copy
    mixture's log-probs, which are always ≤ 0)."""
    if penalty == 1.0:
        return logp
    b, tmax = seqs.shape
    seen = jnp.arange(tmax)[None, :] < cur_len  # [1, Tmax] → broadcast
    present = jnp.zeros(logp.shape, bool).at[
        jnp.arange(b)[:, None], seqs
    ].max(jnp.broadcast_to(seen, seqs.shape))
    penalized = jnp.where(logp > 0, logp / penalty, logp * penalty)
    return jnp.where(present, penalized, logp)


def _sample_filter(
    logp: jax.Array, top_k: int, top_p: float, temperature: float
) -> jax.Array:
    """Temperature + top-k + nucleus filtering (HF sampling knobs)."""
    if temperature != 1.0:
        logp = logp / temperature
    if top_k > 0:
        kth = jnp.sort(logp, axis=-1)[:, -top_k][:, None]
        logp = jnp.where(logp < kth, NEG, logp)
    if top_p < 1.0:
        srt = jnp.sort(logp, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p  # smallest set with mass ≥ top_p
        thresh = jnp.min(
            jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True
        )
        logp = jnp.where(logp < thresh, NEG, logp)
    return logp


def generate(
    params,
    cfg: RAGConfig,
    enc_out: RAGEncoderOutput,
    opts: GenerationOptions,
    *,
    dtype=jnp.float32,
    rng: jax.Array | None = None,  # PRNG key for do_sample
) -> jax.Array:
    """Returns generated ids [B, max_new_tokens] (pad-filled after eos).

    Retrieval happens ONCE (in `rag_encode`, before decoding — the
    reference's semantics at sotasum/lightning_model.py:301-306); memory
    stays fixed (and un-expanded) for all decode steps.
    """
    if opts.num_beams <= 1:
        return _greedy(params, cfg, enc_out, opts, dtype, rng=rng)
    return _beam(params, cfg, enc_out, opts, dtype)


def _step_fn(params, cfg, dtype, copy_kv=None):
    def step(enc_out, tok, caches, pos):
        out, _, caches = rag_decode(
            params, cfg, enc_out, tok[:, None], caches=caches,
            pos_offset=pos, dtype=dtype, copy_kv=copy_kv,
        )
        out = out[:, 0]  # [B, V]
        if cfg.mips_disabled or enc_out.memory is None:
            logp = jax.nn.log_softmax(out, axis=-1)
        else:
            logp = out  # already log-probs from the copy mixture
        return logp, caches

    return step


def _init_caches(params, cfg, b, t_max, dtype, enc_hidden=None):
    from .led import init_decode_caches

    led_params = params["led"] if "led" in params else params
    return init_decode_caches(
        led_params, cfg.led, b, t_max, dtype, enc_hidden=enc_hidden
    )


def _copy_kv(params, cfg, enc_out, dtype):
    if cfg.mips_disabled or enc_out.memory is None or not cfg.use_own_decoder:
        return None
    from .copy_decoder import precompute_copy_kv

    return precompute_copy_kv(
        params["copy_head"], enc_out.memory.astype(dtype),
        cfg.copy_heads or cfg.led.n_heads,
    )


def _greedy(params, cfg, enc_out, opts: GenerationOptions, dtype, rng=None):
    b = enc_out.enc_hidden.shape[0]
    t_max = opts.max_new_tokens
    pad, eos = cfg.led.pad_id, cfg.led.eos_id
    step = _step_fn(params, cfg, dtype, _copy_kv(params, cfg, enc_out, dtype))
    caches = _init_caches(
        params, cfg, b, t_max + 1, dtype, enc_hidden=enc_out.enc_hidden
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)

    seqs0 = jnp.full((b, t_max + 1), pad, jnp.int32)
    seqs0 = seqs0.at[:, 0].set(opts.decoder_start_id)

    def body(carry, t):
        seqs, caches, done = carry
        tok = jnp.take_along_axis(seqs, t[None, None], axis=1)[:, 0]
        logp, caches = step(enc_out, tok, caches, t)
        logp = _apply_repetition_penalty(
            seqs, t + 1, logp, opts.repetition_penalty
        )
        logp = _ban_repeated_ngrams(
            seqs, t + 1, logp, opts.no_repeat_ngram_size
        )
        logp = jnp.where(
            (t + 1 < opts.min_length)
            & (jnp.arange(logp.shape[-1]) == eos)[None, :],
            NEG,
            logp,
        )
        if opts.do_sample:
            logp = _sample_filter(
                logp, opts.top_k, opts.top_p, opts.temperature
            )
            nxt = jax.random.categorical(
                jax.random.fold_in(rng, t), logp, axis=-1
            ).astype(jnp.int32)
        else:
            nxt = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad, nxt)
        seqs = seqs.at[:, t + 1].set(nxt)
        done = done | (nxt == eos)
        return (seqs, caches, done), None

    (seqs, _, _), _ = jax.lax.scan(
        body, (seqs0, caches, jnp.zeros((b,), bool)), jnp.arange(t_max)
    )
    return seqs[:, 1:]


def _beam(params, cfg, enc_out, opts: GenerationOptions, dtype):
    b_real = enc_out.enc_hidden.shape[0]
    beams = opts.num_beams
    # Sublane alignment: the folded beam-batch axis (bb) is the second-to-
    # minor dim of every per-step decode matmul; bb % 8 != 0 (e.g. the
    # canonical serving shape B=1, beams=4 → bb=4) forces sub-tile shapes
    # that decode ~2x slower than the aligned bb=8 (measured on v5e,
    # artifacts/decode_bench.jsonl). Pad the BATCH with duplicate rows to
    # the smallest b with b*beams % 8 == 0: beam search is independent per
    # batch row, so results for the real rows are bit-identical; padded
    # rows are sliced off at the end.
    import math as _math

    group = 8 // _math.gcd(beams, 8)
    b = -(-b_real // group) * group
    if b != b_real:
        reps = b - b_real

        def _pad_rows(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == b_real:
                return jnp.concatenate(
                    [x, jnp.repeat(x[:1], reps, axis=0)], axis=0
                )
            return x

        enc_out = jax.tree_util.tree_map(_pad_rows, enc_out)
    bb = b * beams
    t_max = opts.max_new_tokens
    pad, eos = cfg.led.pad_id, cfg.led.eos_id

    # Encoder outputs + memory are NOT beam-expanded (the torch reference
    # index_selects beam copies every step, retriever_generator.py:314-334):
    # attention folds the beam axis into the query time axis against the
    # un-expanded [b, ...] K/V (core._fold_groups), so per-step HBM traffic
    # and the beam-reorder gather shrink by the beam factor.
    step = _step_fn(params, cfg, dtype, _copy_kv(params, cfg, enc_out, dtype))
    caches = _init_caches(
        params, cfg, bb, t_max + 1, dtype, enc_hidden=enc_out.enc_hidden
    )

    seqs0 = jnp.full((bb, t_max + 1), pad, jnp.int32)
    seqs0 = seqs0.at[:, 0].set(opts.decoder_start_id)
    # beam 0 live, others dead at start
    scores0 = jnp.tile(
        jnp.asarray([0.0] + [NEG] * (beams - 1))[None, :], (b, 1)
    )

    fin_seqs0 = jnp.full((b, beams, t_max + 1), pad, jnp.int32)
    fin_scores0 = jnp.full((b, beams), NEG)

    def body(carry, t):
        seqs, caches, scores, fin_seqs, fin_scores = carry
        tok = jnp.take_along_axis(seqs, t[None, None], axis=1)[:, 0]
        logp, new_caches = step(enc_out, tok, caches, t)  # [bb, V]
        v = logp.shape[-1]
        logp = _apply_repetition_penalty(
            seqs, t + 1, logp, opts.repetition_penalty
        )
        logp = _ban_repeated_ngrams(
            seqs, t + 1, logp, opts.no_repeat_ngram_size
        )
        logp = jnp.where(
            (t + 1 < opts.min_length)
            & (jnp.arange(v) == eos)[None, :],
            NEG,
            logp,
        )
        total = scores.reshape(bb, 1) + logp  # [bb, V]
        total = total.reshape(b, beams * v)
        top_scores, top_idx = jax.lax.top_k(total, 2 * beams)  # [b, 2*beams]
        src_beam = top_idx // v  # [b, 2*beams]
        tok_id = (top_idx % v).astype(jnp.int32)

        is_eos = tok_id == eos
        # finished candidates → push into finished set (length penalty)
        lp = jnp.power(
            (5.0 + (t + 1).astype(jnp.float32)) / 6.0, opts.length_penalty
        )
        cand_fin = jnp.where(is_eos, top_scores / lp, NEG)  # [b, 2*beams]
        # build candidate finished seqs
        src_flat = (jnp.arange(b)[:, None] * beams + src_beam).reshape(-1)
        cand_seqs = seqs[src_flat].reshape(b, 2 * beams, t_max + 1)
        cand_seqs = cand_seqs.at[:, :, t + 1].set(
            jnp.where(is_eos, pad, tok_id)
        )
        all_fin_scores = jnp.concatenate([fin_scores, cand_fin], axis=1)
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        fin_top, fin_pos = jax.lax.top_k(all_fin_scores, beams)
        new_fin_seqs = jnp.take_along_axis(
            all_fin_seqs, fin_pos[:, :, None], axis=1
        )
        if opts.early_stopping:
            # HF early_stopping=True: once `beams` hypotheses finished,
            # the finished set is frozen — later (possibly better) ones
            # no longer displace it
            was_done = jnp.all(fin_scores > NEG / 2, axis=1)  # [b]
            fin_seqs = jnp.where(
                was_done[:, None, None], fin_seqs, new_fin_seqs
            )
            fin_scores = jnp.where(was_done[:, None], fin_scores, fin_top)
        else:
            fin_seqs = new_fin_seqs
            fin_scores = fin_top

        # alive candidates: non-eos, first `beams`
        alive_scores = jnp.where(is_eos, NEG, top_scores)
        alive_top, alive_pos = jax.lax.top_k(alive_scores, beams)  # [b,beams]
        alive_beam = jnp.take_along_axis(src_beam, alive_pos, axis=1)
        alive_tok = jnp.take_along_axis(tok_id, alive_pos, axis=1)

        gather = (jnp.arange(b)[:, None] * beams + alive_beam).reshape(-1)
        seqs = seqs[gather].reshape(bb, t_max + 1)
        seqs = seqs.at[:, t + 1].set(alive_tok.reshape(-1))
        # beam reorder touches every beam-laid-out leaf (leading dim bb),
        # selected by SHAPE so future cache entries (e.g. a copy-head
        # cache) are reordered too; cross-attention ck/cv are [b, ...]
        # beam-invariant and excluded by name in case b == bb elsewhere
        caches = [
            {
                kk: (
                    vv[gather]
                    if kk not in ("ck", "cv")
                    and getattr(vv, "ndim", 0) >= 1
                    and vv.shape[0] == bb
                    else vv
                )
                for kk, vv in layer.items()
            }
            for layer in new_caches
        ]
        return (seqs, caches, alive_top, fin_seqs, fin_scores), None

    carry, _ = jax.lax.scan(
        body, (seqs0, caches, scores0, fin_seqs0, fin_scores0),
        jnp.arange(t_max),
    )
    seqs, _, scores, fin_seqs, fin_scores = carry

    # fall back to best alive beam if nothing finished
    lp = jnp.power((5.0 + t_max) / 6.0, opts.length_penalty)
    alive_best = scores[:, 0] / lp
    use_fin = fin_scores[:, 0] > alive_best
    if opts.early_stopping:
        # an early-stopped item always returns from the finished set
        use_fin = use_fin | jnp.all(fin_scores > NEG / 2, axis=1)
    best_alive = seqs.reshape(b, beams, t_max + 1)[:, 0]
    best = jnp.where(use_fin[:, None], fin_seqs[:, 0], best_alive)
    return best[:b_real, 1:]


def copy_trace(
    params,
    cfg: RAGConfig,
    enc_out: RAGEncoderOutput,
    generated_ids: jax.Array,  # [B, T]
    *,
    decoder_start_id: int = 2,
    top_positions: int = 4,
    dtype=jnp.float32,
):
    """Per-token copy-probability traces for generated sequences.

    Parity surface for `output_copy_probs` (reference per-token traces
    collected during beam search, sotasum/lightning_model.py:340-354):
    one teacher-forced pass over the generated ids yields, per output
    token, the copy gate and the top memory positions it copied from.

    Returns dict with copy_gate [B, T], copy_mass [B, T],
    top_mem_pos [B, T, P] (flattened memory positions), and
    top_mem_tok [B, T, P] (their vocab ids).
    """
    from .led import shift_tokens_right

    dec_in = shift_tokens_right(
        generated_ids, cfg.led.pad_id, decoder_start_id
    )
    _, aux, _ = rag_decode(params, cfg, enc_out, dec_in, dtype=dtype)
    if not aux:
        return {}
    gate = aux["copy_gate"][..., 0]
    probs = aux["copy_probs"]  # [B, T, M]
    top_vals, top_pos = jax.lax.top_k(probs, top_positions)
    top_tok = jnp.take_along_axis(
        jnp.broadcast_to(
            enc_out.copy_seq[:, None, :],
            (probs.shape[0], probs.shape[1], probs.shape[2]),
        ),
        top_pos,
        axis=-1,
    )
    return {
        "copy_gate": gate,
        "copy_mass": jnp.sum(probs, axis=-1),
        "top_mem_pos": top_pos,
        "top_mem_tok": top_tok,
        "top_mem_prob": top_vals,
    }
