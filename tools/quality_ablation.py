"""Memory ON vs OFF quality ablation, multi-seed + equal-compute (v2).

The reference's raison d'être is that non-parametric memory guidance
improves related-work generation (it checkpoints on max rouge1,
sotasum/lightning_model.py:377-389, and ships config/no_mips.yaml as the
ablation arm). v2 addresses the round-3 review of the single-seed v1:

  * arm "memory":      tiny RAG model, MIPS over the fixture's cited-
                       abstract corpus, copy decoder on
  * arm "no_memory":   identical model/data/optimizer with
                       mips_disabled=True, SAME step count (equal-steps)
  * arm "no_memory_eq": no_memory retrained for the memory arm's
                       wall-clock budget (equal-compute — the memory arm
                       is ~4.75x slower per step, so equal-steps alone
                       flatters it)

All arms repeat over --seeds; beam-4 decode of the full test split; the
per-step retriever metrics (recall / MRR / MAP vs the gold cited aid,
logged by the train step) are summarized as first-vs-last trajectory.
Writes artifacts/quality_ablation.json with per-seed numbers, mean ± std
deltas, and a stated conclusion.

Usage: python tools/quality_ablation.py [--steps 600] [--seeds 0 1 2] [--save]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(memory: bool, steps: int, workdir: str, seed: int = 0,
              name: str | None = None):
    from retrieval_augmented_mds_tpu.models.retriever_generator import RAGConfig
    from retrieval_augmented_mds_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        GenerationOptions,
        IndexConfig,
        LoggingConfig,
    )
    from retrieval_augmented_mds_tpu.train.trainer import TrainHyper

    name = name or ("memory" if memory else "no_memory")
    return ExperimentConfig(
        model=RAGConfig.tiny(
            mips_topk=2, memory_len=64, mips_disabled=not memory
        ),
        train=TrainHyper(
            lr=3e-3, warmup_steps=20, total_steps=steps,
            label_smoothing_eps=0.1, grad_clip=1.0,
        ),
        data=DataConfig(
            source="fixture", max_length=256, query_max_length=64,
            decoder_max_length=64, memory_len=64, batch_size=8,
        ),
        index=IndexConfig(factory="Flat", rebuild_every=max(steps // 4, 1)),
        generation=GenerationOptions(
            max_new_tokens=48, num_beams=4, no_repeat_ngram_size=3,
        ),
        precision="bfloat16",
        max_steps=steps,
        eval_every=0,
        ckpt_dir=None,
        logging=LoggingConfig(
            log_dir=os.path.join(workdir, f"{name}_s{seed}"), run_name=name
        ),
        seed=seed,
    )


def _retriever_trajectory(log_dir: str, run_name: str):
    """First-vs-last window means of the per-step retriever metrics the
    train step logs (recall / reciprocal_rank / average_precision vs the
    gold cited aid — reference log_retriever_metrics, mips.py:456-463)."""
    path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
    if not os.path.exists(path):
        return None
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    keys = [k for k in rows[-1] if k.startswith("retriever_")]
    if not keys:
        return None
    w = max(1, len(rows) // 10)

    def mean(rs, k):
        vs = [r[k] for r in rs if k in r]
        return round(sum(vs) / max(len(vs), 1), 4)

    return {
        k: {"first": mean(rows[:w], k), "last": mean(rows[-w:], k)}
        for k in keys
    }


def _train_and_eval(cli, cfg, workdir: str, name: str, seed: int):
    import shutil

    ckpt = os.path.join(workdir, f"{name}_s{seed}", "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)  # stale ckpt would resume
    cfg = dataclasses.replace(cfg, ckpt_dir=ckpt)
    t0 = time.perf_counter()
    fit_out = cli.run_fit(cfg)
    train_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    rouge = cli.run_validate(cfg, split="test")
    eval_s = round(time.perf_counter() - t0, 1)
    res = {
        "final_train_loss": fit_out.get("loss"),
        "steps": fit_out.get("steps"),
        "train_s": train_s,
        "eval_s": eval_s,
        **{k: round(float(v), 4) for k, v in rouge.items()},
    }
    traj = _retriever_trajectory(cfg.logging.log_dir, cfg.logging.run_name)
    if traj:
        res["retriever_trajectory"] = traj
    return res


def _mean_std(vals):
    m = sum(vals) / len(vals)
    var = sum((v - m) ** 2 for v in vals) / max(len(vals) - 1, 1)
    return round(m, 4), round(var ** 0.5, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--skip-equal-compute", action="store_true")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--workdir", default="/tmp/quality_ablation")
    args = ap.parse_args()

    import jax

    from retrieval_augmented_mds_tpu import cli

    per_seed = {}
    for seed in args.seeds:
        arms = {}
        arms["memory"] = _train_and_eval(
            cli, build_cfg(True, args.steps, args.workdir, seed),
            args.workdir, "memory", seed,
        )
        print(json.dumps({f"memory_s{seed}": arms["memory"]}), flush=True)
        arms["no_memory"] = _train_and_eval(
            cli, build_cfg(False, args.steps, args.workdir, seed),
            args.workdir, "no_memory", seed,
        )
        print(json.dumps({f"no_memory_s{seed}": arms["no_memory"]}),
              flush=True)
        if not args.skip_equal_compute:
            # equal-compute arm: scale no_memory's step count so its
            # wall-clock matches the memory arm's (memory pays retrieval +
            # re-encode per step; equal-steps alone flatters it)
            ratio = arms["memory"]["train_s"] / max(
                arms["no_memory"]["train_s"], 1e-9
            )
            eq_steps = max(args.steps, int(round(args.steps * ratio)))
            cfg = build_cfg(False, eq_steps, args.workdir, seed,
                            name="no_memory_eq")
            arms["no_memory_eq"] = _train_and_eval(
                cli, cfg, args.workdir, "no_memory_eq", seed,
            )
            arms["no_memory_eq"]["steps_equal_compute"] = eq_steps
            print(json.dumps({f"no_memory_eq_s{seed}": arms["no_memory_eq"]}),
                  flush=True)
        per_seed[seed] = arms

    rouge_keys = ("rouge1", "rouge2", "rougeL")
    arm_names = list(next(iter(per_seed.values())).keys())
    aggregate = {}
    for arm in arm_names:
        aggregate[arm] = {}
        for k in rouge_keys:
            m, s = _mean_std([per_seed[sd][arm][k] for sd in args.seeds])
            aggregate[arm][k] = {"mean": m, "std": s}
    deltas = {}
    for base in [a for a in arm_names if a != "memory"]:
        deltas[f"memory_minus_{base}"] = {}
        for k in rouge_keys:
            m, s = _mean_std([
                per_seed[sd]["memory"][k] - per_seed[sd][base][k]
                for sd in args.seeds
            ])
            deltas[f"memory_minus_{base}"][k] = {"mean": m, "std": s}

    d1 = deltas.get("memory_minus_no_memory_eq",
                    deltas["memory_minus_no_memory"])["rouge1"]
    conclusion = (
        f"memory beats the {'equal-compute' if 'memory_minus_no_memory_eq' in deltas else 'equal-steps'} "
        f"no-memory arm by {d1['mean']:+.2f} rouge1 "
        f"(± {d1['std']:.2f} over {len(args.seeds)} seeds)"
        if d1["mean"] > 0 else
        f"memory does NOT beat no-memory at this scale "
        f"({d1['mean']:+.2f} ± {d1['std']:.2f} rouge1)"
    )

    out = {
        "bench": "quality_ablation_v2",
        "dataset": "multi_x_science_200 fixture (deterministic splits)",
        "steps": args.steps,
        "seeds": args.seeds,
        "eval": "beam-4 full test split",
        "backend": jax.default_backend(),
        "per_seed": {str(k): v for k, v in per_seed.items()},
        "aggregate": aggregate,
        "deltas": deltas,
        "conclusion": conclusion,
    }
    print(json.dumps(out), flush=True)
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/quality_ablation.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
