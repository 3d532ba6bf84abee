"""Memory ON vs OFF quality ablation (VERDICT r2 next-item #2).

The reference's raison d'être is that non-parametric memory guidance
improves related-work generation (it checkpoints on max rouge1,
sotasum/lightning_model.py:377-389, and ships config/no_mips.yaml as the
ablation arm). This runs that comparison end to end at fixture scale:

  * arm "memory":     tiny RAG model, MIPS over the fixture's cited-
                      abstract corpus, copy decoder on
  * arm "no_memory":  identical model/data/optimizer with
                      mips_disabled=True (plain LED fine-tune — the true
                      no-retrieval ablation)

Both arms train the same number of steps on the SAME deterministic train
split of the committed 200-example real-schema Multi-XScience fixture,
then beam-decode the full test split and report ROUGE. Writes
artifacts/quality_ablation.json.

Usage: python tools/quality_ablation.py [--steps 600] [--save]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(memory: bool, steps: int, workdir: str):
    from retrieval_augmented_mds_tpu.models.retriever_generator import RAGConfig
    from retrieval_augmented_mds_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        GenerationOptions,
        IndexConfig,
        LoggingConfig,
    )
    from retrieval_augmented_mds_tpu.train.trainer import TrainHyper

    name = "memory" if memory else "no_memory"
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
        logging=LoggingConfig(log_dir=os.path.join(workdir, name),
                              run_name=name),
        seed=0,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--workdir", default="/tmp/quality_ablation")
    args = ap.parse_args()

    import jax

    from retrieval_augmented_mds_tpu import cli

    results = {}
    for memory in (True, False):
        name = "memory" if memory else "no_memory"
        cfg = build_cfg(memory, args.steps, args.workdir)
        # train (fresh — a stale checkpoint would silently resume)
        import shutil

        ckpt = os.path.join(args.workdir, name, "ckpt")
        shutil.rmtree(ckpt, ignore_errors=True)
        cfg = dataclasses.replace(cfg, ckpt_dir=ckpt)
        t0 = time.perf_counter()
        fit_out = cli.run_fit(cfg)
        train_s = round(time.perf_counter() - t0, 1)
        # test-split eval with the trained checkpoint (run_validate loads
        # ckpt_dir/latest.json written by fit)
        t0 = time.perf_counter()
        rouge = cli.run_validate(cfg, split="test")
        eval_s = round(time.perf_counter() - t0, 1)
        results[name] = {
            "final_train_loss": fit_out.get("loss"),
            "steps": fit_out.get("steps"),
            "train_s": train_s,
            "eval_s": eval_s,
            **{k: round(float(v), 4) for k, v in rouge.items()},
        }
        print(json.dumps({name: results[name]}))

    delta = {
        k: round(results["memory"][k] - results["no_memory"][k], 4)
        for k in ("rouge1", "rouge2", "rougeL")
        if k in results["memory"] and k in results["no_memory"]
    }
    out = {
        "bench": "quality_ablation",
        "dataset": "multi_x_science_200 fixture (deterministic splits)",
        "steps": args.steps,
        "backend": jax.default_backend(),
        "memory": results["memory"],
        "no_memory": results["no_memory"],
        "delta_memory_minus_no_memory": delta,
    }
    print(json.dumps(out))
    if args.save:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/quality_ablation.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
