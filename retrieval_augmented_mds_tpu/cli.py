"""Command-line entry points.

Covers the reference's CLI surface (SURVEY.md L7): `main.py
{fit,validate,test,predict}` via LightningCLI, `python -m sotasum.pretrain
--mode {train,test,predict}`, plus the index tooling BASELINE.json asks
for:

    python -m retrieval_augmented_mds_tpu.cli fit        --config <yaml>
    python -m retrieval_augmented_mds_tpu.cli validate   --config <yaml>
    python -m retrieval_augmented_mds_tpu.cli test       --config <yaml>
    python -m retrieval_augmented_mds_tpu.cli predict    --config <yaml>
    python -m retrieval_augmented_mds_tpu.cli pretrain-retriever --config <yaml>
    python -m retrieval_augmented_mds_tpu.cli build-index --config <yaml> --out <dir>
    python -m retrieval_augmented_mds_tpu.cli bench-index --config <yaml>
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import time
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

def _jnp():
    import jax.numpy as jnp

    return jnp


def build_mesh(cfg):
    import jax

    from .parallel import MeshSpec, best_mesh

    n = len(jax.devices())
    if cfg.mesh.data == 0 or cfg.mesh.shard == 0:
        return None  # explicit single-device (mesh: {data: 0})
    if cfg.mesh.data and cfg.mesh.shard:
        return MeshSpec(cfg.mesh.data, cfg.mesh.shard).build()
    if n == 1:
        return None
    return best_mesh(n)


def build_data(cfg, prompt_prefix: str = ""):
    from .data import RAGDataModule, load_tokenizer, synthetic_multi_x_science

    d = cfg.data
    if d.source == "synthetic":
        df = synthetic_multi_x_science(d.n_synthetic)
    elif d.source == "fixture" or d.source.endswith((".json", ".json.gz")):
        # committed real-schema fixture (offline stand-in for the HF
        # dataset; tools/make_fixture.py)
        from .data.corpus import load_fixture

        df = load_fixture(None if d.source == "fixture" else d.source)
    else:
        from .data.corpus import load_multi_x_science

        hf = load_multi_x_science(
            d.source if d.source != "multi_x_science" else "multi_x_science_sum"
        )
        import pandas as pd

        df = pd.concat(
            [v.to_pandas() for v in hf.values()], ignore_index=True
        )
    if d.dataset_mode == "aggregated":
        from .data.corpus import aggregate_by_aid

        df = aggregate_by_aid(df)
    tok = load_tokenizer(d.tokenizer, vocab_size=cfg.model.led.vocab_size,
                         doc_sep=d.doc_sep, fallback=d.tokenizer_fallback)
    qtok = load_tokenizer(d.tokenizer, vocab_size=cfg.model.query_enc.vocab_size,
                          doc_sep=d.doc_sep, fallback=d.tokenizer_fallback)
    dm = RAGDataModule(
        df, tok, qtok,
        corpus_column=d.corpus_column,
        mips_dataset=d.mips_dataset,
        arxiv_path=d.mips_arxiv_path,
        max_length=d.max_length,
        query_max_length=d.query_max_length,
        decoder_max_length=d.decoder_max_length,
        memory_len=d.memory_len,
        source_memory=d.source_memory,
        doc_sep=d.doc_sep,
        dual_memory=d.dataset_mode == "dual",
        prompt_prefix=prompt_prefix,
        cache_dir=d.cache_dir,
    ).prepare()
    if d.mips_db_max_size:
        # corpus truncation (reference mips_db_max_size, mips.py:184-185)
        for k in dm.store_arrays:
            dm.store_arrays[k] = dm.store_arrays[k][: d.mips_db_max_size]
    return dm, tok


def build_store(params, cfg, dm=None, mesh=None, *, token_ids=None,
                token_mask=None, row_aids=None):
    """Embed the tokenized corpus under the current mips encoder and build
    the configured index. Thin adapter over
    train.trainer.build_memory_store — the ONE build path shared with the
    train-time refresh, so precision/factory/train_size cannot drift
    between an initial build and a rebuild (reference rebuild protocol,
    SURVEY.md §3.2)."""
    import jax.numpy as jnp

    from .train.trainer import build_memory_store

    if dm is not None:
        token_ids = jnp.asarray(dm.store_arrays["token_ids"])
        token_mask = jnp.asarray(dm.store_arrays["token_mask"])
        aids = dm.store_arrays.get("row_aids")
        row_aids = jnp.asarray(aids) if aids is not None else None
    return build_memory_store(
        params, cfg.model, cfg.index,
        token_ids=token_ids, token_mask=token_mask, row_aids=row_aids,
        mesh=mesh, seed=cfg.seed,
        compute_dtype=jnp.bfloat16 if cfg.precision == "bfloat16"
        else jnp.float32,
    )


def load_store(index_dir: str, cfg, mesh=None):
    """Rebuild a MemoryStore from a persisted `build-index` directory —
    no re-embed (reference `Mips.load`, sotasum/mips.py:545-549). The
    validate/test/export commands take this via `--index` so a 1M-doc
    corpus isn't re-encoded on every run."""
    import jax.numpy as jnp

    from .index import load_index
    from .models.retriever_generator import MemoryStore

    index = load_index(index_dir, mesh=mesh)
    tok = np.load(os.path.join(index_dir, "corpus_tokens.npz"))
    row_aids = (
        jnp.asarray(tok["row_aids"]) if "row_aids" in tok.files else None
    )
    return MemoryStore(
        index=index,
        token_ids=jnp.asarray(tok["token_ids"]),
        token_mask=jnp.asarray(tok["token_mask"]),
        row_aids=row_aids,
        nprobe=cfg.index.nprobe,
    )


def _device_batch(batch, cfg, mesh=None):
    """Host batch → device arrays. With a mesh, every array is placed
    data-parallel — sharded over the ``data`` axis (the DDP batch split of
    reference config/no_mips.yaml:4-16) — so the jitted step never has to
    infer the batch sharding from the index placement alone."""
    import jax.numpy as jnp

    from .models.led import shift_tokens_right

    out = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in (
            "input_ids", "attention_mask", "query_input_ids",
            "query_attention_mask", "labels", "mips_ignore", "gold_aid",
            "aid_counts", "target_memory_ids", "target_memory_mask",
            "input_memory_ids", "input_memory_mask", "input_memory_count",
        )
    }
    out["decoder_input_ids"] = shift_tokens_right(
        out["labels"], cfg.model.led.pad_id, cfg.generation.decoder_start_id
    )
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA_AXIS

        ndata = mesh.shape[DATA_AXIS]
        b = out["input_ids"].shape[0]
        if ndata > 1 and b % ndata == 0:
            out = {
                k: jax.device_put(
                    v,
                    NamedSharding(mesh, P(DATA_AXIS, *[None] * (v.ndim - 1))),
                )
                for k, v in out.items()
            }
    return out


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def build_tx(cfg, params, mesh=None):
    """The ONE optimizer construction — fit and every checkpoint-loading
    command must build the same transformation tree, or the saved
    opt_state won't restore. ``mesh`` only changes how the 8-bit fused
    update executes (per-shard under shard_map), never the state tree."""
    from .train.optimizer import build_optimizer

    frozen = tuple(cfg.train.frozen_groups) + cfg.model.frozen_groups()
    return build_optimizer(
        cfg.train.lr, cfg.train.warmup_steps, cfg.train.total_steps,
        weight_decay=cfg.train.weight_decay, grad_clip=cfg.train.grad_clip,
        frozen_groups=frozen, params=params,
        accumulate_steps=cfg.train.accumulate_steps,
        mu_dtype=cfg.train.adam_mu_dtype,
        state_8bit=cfg.train.adam_8bit,
        state_8bit_fused=cfg.train.adam_8bit_fused,
        mesh=mesh,
    )


def run_fit(cfg) -> dict[str, Any]:
    import jax

    from .models.retriever_generator import init_rag_pretrained
    from .obs import MetricsLogger, TeamsNotifier
    from .train.trainer import TrainState, make_train_step
    from .utils.checkpoint import save_train_state
    from .utils.config import save_config

    mesh = build_mesh(cfg)
    dm, tok = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)

    import jax.numpy as jnp

    tx = build_tx(cfg, params, mesh=mesh)
    state = TrainState.create(params, tx)
    start_step = 0
    if cfg.ckpt_dir and os.path.exists(
        os.path.join(cfg.ckpt_dir, "latest.json")
    ):
        # resume (reference ckpt_path, no_mips.yaml:72)
        from .utils.checkpoint import load_train_state

        state, start_step = load_train_state(cfg.ckpt_dir, state)
        print(f"resumed from step {start_step}")
    # the store is built from the CURRENT (possibly resumed) weights —
    # the reference rebuilds the index at fit start for the same reason
    # (lightning_model.py on_train_start rebuild, SURVEY.md §3.2)
    store = (
        None if cfg.model.mips_disabled
        else build_store(state.params, cfg, dm, mesh)
    )
    if mesh is not None:
        # the verified multi-chip composition (__graft_entry__.dryrun_
        # multichip): params replicated, optimizer state ZeRO-sharded over
        # ``data`` (parallel/zero.py — the DeepSpeed-ZeRO analog of
        # reference pretrain.py:605-614), batches data-sharded below.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import zero_sharding_for_tree

        state = TrainState(
            params=jax.device_put(state.params, NamedSharding(mesh, P())),
            opt_state=jax.device_put(
                state.opt_state, zero_sharding_for_tree(state.opt_state, mesh)
            ),
            step=state.step,
        )
    dtype = jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32
    step_fn = make_train_step(
        cfg.model, tx, cfg.train, mesh=mesh, dtype=dtype,
        remat=cfg.train.remat,
    )

    log = MetricsLogger(cfg.logging.log_dir, cfg.logging.run_name,
                        tensorboard=cfg.logging.tensorboard,
                        mlflow=cfg.logging.mlflow)
    log.log_hyperparams(dataclasses.asdict(cfg))
    save_config(cfg, os.path.join(cfg.logging.log_dir, "config_resolved.yaml"))
    teams = TeamsNotifier(cfg.logging.teams_webhook, cfg.logging.run_name)
    teams.on_fit_start()

    import contextlib

    from .utils.checkpoint import mark_best

    step = start_step
    metrics = {}
    best_rouge1 = -1.0
    # last step a checkpoint was written for; a resumed run starts "saved"
    # at start_step so a no-op resume doesn't rewrite the checkpoint
    last_saved = start_step if start_step else -1
    # batch schedule is a pure function of (cfg.seed, global step): epoch
    # e shuffles with seed cfg.seed + e, so a resumed run re-enters the
    # SAME epoch permutation at the same offset and the trajectory is
    # bit-compatible with a never-interrupted run (tested in
    # tests/test_cli.py crash-resume)
    steps_per_epoch = max(
        1, len(dm.split_indices("train")) // cfg.data.batch_size
    )
    try:
      with (mesh if mesh is not None else contextlib.nullcontext()):
        while step < cfg.max_steps:
            epoch = step // steps_per_epoch
            skip = step % steps_per_epoch  # nonzero only right after resume
            for bi, batch in enumerate(
                dm.batches(cfg.data.batch_size, seed=cfg.seed + epoch,
                           split="train")
            ):
                if bi < skip:
                    continue
                if step >= cfg.max_steps:
                    break
                if (
                    store is not None
                    and cfg.index.rebuild_every > 0
                    and step > 0
                    and step % cfg.index.rebuild_every == 0
                ):
                    # double-buffered refresh (SURVEY.md §3.2 equivalent):
                    # the SAME embed+build path as the initial build, so
                    # precision/factory/train_size cannot drift
                    store = build_store(
                        state.params, cfg, mesh=mesh,
                        token_ids=store.token_ids,
                        token_mask=store.token_mask,
                        row_aids=store.row_aids,
                    )
                dbatch = _device_batch(batch, cfg, mesh)
                force = (
                    # per-step seeded draw (not a sequential rng): the
                    # forcing schedule survives crash-resume unchanged
                    np.random.default_rng([cfg.seed, step]).random()
                    < cfg.model.copy_forcing
                    if cfg.model.memory_forcing == "target_in"
                    else None
                )
                t0 = time.perf_counter()
                state, metrics = step_fn(
                    state, store, dbatch,
                    None if force is None else bool(force),
                )
                float(metrics["loss"])  # fence: includes device time,
                # not just the async dispatch (+1 RTT on a tunnel)
                sec = time.perf_counter() - t0
                metrics["steps_per_s"] = 1.0 / max(sec, 1e-9)
                metrics["tokens_per_s"] = (
                    dbatch["input_ids"].size / max(sec, 1e-9)
                )
                log.log(step, metrics)
                step += 1
                if (
                    cfg.ckpt_dir and cfg.train.save_every
                    and step % cfg.train.save_every == 0
                ):
                    # step-interval crash insurance, independent of eval
                    # wins (reference per-epoch ModelCheckpoint)
                    save_train_state(cfg.ckpt_dir, state, step)
                    last_saved = step
                if cfg.eval_every and step % cfg.eval_every == 0:
                    ev = run_eval_loop(cfg, state.params, store, dm, tok,
                                       max_batches=cfg.eval_max_batches,
                                       mesh=mesh)
                    log.log(step, ev, prefix="val_")
                    # checkpoint on max rouge1 (reference ModelCheckpoint
                    # monitor, config/no_mips.yaml:27-33)
                    if cfg.ckpt_dir and ev.get("rouge1", 0) > best_rouge1:
                        best_rouge1 = ev["rouge1"]
                        path = save_train_state(cfg.ckpt_dir, state, step)
                        mark_best(cfg.ckpt_dir, step, path, best_rouge1)
                        last_saved = step
        if cfg.ckpt_dir and last_saved != step:
            # persist the final state: a run whose max_steps is not a
            # save_every multiple must not lose its tail interval
            save_train_state(cfg.ckpt_dir, state, step)
    except BaseException as e:  # noqa: BLE001
        teams.on_exception(e)
        raise
    out = {k: float(v) for k, v in metrics.items()}
    out["steps"] = step
    return out


@functools.lru_cache(maxsize=8)
def _make_eval_step(model_cfg, gen_opts, dtype, mesh=None):
    import jax

    from .models.generate import generate
    from .models.retriever_generator import rag_encode

    @jax.jit
    def eval_step(params, store, dbatch):
        enc = rag_encode(params, model_cfg, store, dbatch, dtype=dtype,
                         mesh=mesh)
        return generate(params, model_cfg, enc, gen_opts, dtype=dtype)

    return eval_step


def run_eval_loop(cfg, params, store, dm, tok, max_batches: int | None = None,
                  dump_name: str | None = None, split: str = "val",
                  mesh=None):
    """Generate + ROUGE over the FULL split (reference validation/test
    epochs iterate the whole dataloader, sotasum/lightning_model.py:327-398);
    optional per-epoch output dump (lightning_model.py:383-389).
    ``max_batches`` caps the epoch (reference limit_val_batches,
    no_mips.yaml:46-49); None = every batch of the split. With ``mesh``
    the eval step runs the same sharded rag_encode as training (index
    shard-placed → sharded search; batch data-parallel)."""
    import contextlib

    import jax.numpy as jnp

    from .eval import RougeAccumulator

    dtype = jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32
    # one compiled encode+generate program, cached across eval epochs
    # (running this eagerly pays per-op dispatch latency on remote
    # backends; re-jitting per epoch pays re-tracing)
    eval_step = _make_eval_step(cfg.model, cfg.generation, dtype, mesh)

    acc = RougeAccumulator()
    outputs = []
    for bi, batch in enumerate(
        dm.batches(cfg.data.batch_size, shuffle=False, drop_last=False,
                   split=split)
    ):
        if max_batches is not None and bi >= max_batches:
            break
        # pad the ragged tail batch to the static batch size (one compiled
        # shape for the whole epoch; reference just runs the smaller batch)
        n_real = len(batch["input_ids"])
        if n_real < cfg.data.batch_size:
            reps = cfg.data.batch_size - n_real
            batch = {
                k: np.concatenate([v, np.repeat(v[:1], reps, axis=0)])
                for k, v in batch.items()
            }
        dbatch = _device_batch(batch, cfg, mesh)
        with (mesh if mesh is not None else contextlib.nullcontext()):
            ids = eval_step(params, store, dbatch)
        preds = tok.batch_decode(np.asarray(ids))[:n_real]
        refs = tok.batch_decode(np.asarray(batch["labels"]))[:n_real]
        acc.add_batch(preds, refs)
        outputs.extend(
            {"prediction": p, "reference": r} for p, r in zip(preds, refs)
        )
    if dump_name:
        from .obs import MetricsLogger

        MetricsLogger(cfg.logging.log_dir, cfg.logging.run_name).dump_outputs(
            dump_name, outputs
        )
    return acc.compute()


def run_validate(cfg, split: str = "val", index_dir: str | None = None):
    import jax

    from .models.retriever_generator import init_rag_pretrained
    from .utils.checkpoint import load_train_state

    mesh = build_mesh(cfg)
    dm, tok = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    if cfg.ckpt_dir and os.path.exists(
        os.path.join(cfg.ckpt_dir, "latest.json")
    ):
        from .train.trainer import TrainState

        like = TrainState.create(params, build_tx(cfg, params))
        # evaluation loads the rouge1-monitored best when marked
        # (reference ckpt_path selection); falls back to latest
        state, _ = load_train_state(cfg.ckpt_dir, like, prefer="best")
        params = state.params
    if cfg.model.mips_disabled:
        store = None
    elif index_dir:
        store = load_store(index_dir, cfg, mesh=mesh)
    else:
        store = build_store(params, cfg, dm, mesh)
    import time as _t

    return run_eval_loop(
        cfg, params, store, dm, tok,
        dump_name=f"{split}_outputs_{int(_t.time())}", split=split,
        mesh=mesh,
    )


def run_predict(cfg, index_dir: str | None = None):
    import jax

    from .models.generate import copy_trace, generate
    from .models.retriever_generator import init_rag_pretrained, rag_encode

    import jax.numpy as jnp

    dm, tok = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    if cfg.model.mips_disabled:
        store = None
    elif index_dir:
        store = load_store(index_dir, cfg)
    else:
        store = build_store(params, cfg, dm)
    batch = next(dm.batches(cfg.data.batch_size, shuffle=False))
    dbatch = _device_batch(batch, cfg)
    dtype = jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32
    enc = rag_encode(params, cfg.model, store, dbatch, dtype=dtype)
    ids = generate(params, cfg.model, enc, cfg.generation, dtype=dtype)
    out = {"predictions": tok.batch_decode(np.asarray(ids))}
    if cfg.generation.output_copy_probs and store is not None:
        tr = copy_trace(
            params, cfg.model, enc, ids,
            decoder_start_id=cfg.generation.decoder_start_id,
        )
        out["copy_traces"] = {
            k: np.asarray(v).tolist() for k, v in tr.items()
        }
    return out


def run_export(cfg, out_dir: str, index_dir: str | None = None):
    """AOT-export the serving step — rag_encode (query encode → MIPS →
    memory re-encode → rescore) + beam/copy generate — as a serialized
    StableHLO artifact (`jax.export`). Production serving then needs no
    Python model code: `jax.export.deserialize(blob).call(params, store,
    batch)`; weights/corpus stay external inputs so checkpoint or index
    refreshes don't re-export. Shapes freeze to the config's serving
    shapes (src/query lengths, batch, beams, max_new_tokens).

    Beyond the reference (which serves through Lightning predict_step +
    live FAISS); the TPU-native serving story pairs this with the
    exported-encoder / index persistence round trips."""
    import jax
    from jax import export as jexport

    from .models.generate import generate
    from .models.retriever_generator import init_rag_pretrained, rag_encode

    dm, tok = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    if cfg.ckpt_dir and os.path.exists(
        os.path.join(cfg.ckpt_dir, "latest.json")
    ):
        from .train.trainer import TrainState
        from .utils.checkpoint import load_train_state

        like = TrainState.create(params, build_tx(cfg, params))
        state, _ = load_train_state(cfg.ckpt_dir, like, prefer="best")
        params = state.params
    if cfg.model.mips_disabled:
        store = None
    elif index_dir:
        store = load_store(index_dir, cfg)
    else:
        store = build_store(params, cfg, dm)
    batch = next(dm.batches(cfg.data.batch_size, shuffle=False))
    # serving signature = exactly the predict path's batch minus the
    # train-only labels: optional memory keys (input_memory_*,
    # target_memory_*, mips_ignore) stay, so dual/source-memory and
    # forcing configs export the same behavior predict serves
    dbatch = {
        k: v for k, v in _device_batch(batch, cfg).items() if k != "labels"
    }
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.precision == "bfloat16" else jnp.float32

    if store is None:
        def serve(params, batch):
            enc = rag_encode(params, cfg.model, None, batch, dtype=dtype)
            return generate(params, cfg.model, enc, cfg.generation,
                            dtype=dtype)

        fn_args = (params, dbatch)
    else:
        # the store is a custom pytree (registered dataclasses with
        # static fields) that jax.export cannot serialize in the call
        # signature — pass its array leaves as a plain tuple and rebuild
        # from the (static) treedef inside the exported function
        store_leaves, store_def = jax.tree_util.tree_flatten(store)

        def serve(params, store_leaves, batch):
            st = jax.tree_util.tree_unflatten(store_def, store_leaves)
            enc = rag_encode(params, cfg.model, st, batch, dtype=dtype)
            return generate(params, cfg.model, enc, cfg.generation,
                            dtype=dtype)

        fn_args = (params, tuple(store_leaves), dbatch)

    avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(tuple(x.shape), x.dtype), fn_args
    )
    exp = jexport.export(jax.jit(serve))(*avals)
    os.makedirs(out_dir, exist_ok=True)
    blob_path = os.path.join(out_dir, "serve_step.jaxexport")
    with open(blob_path, "wb") as f:
        f.write(exp.serialize())
    manifest = {
        "artifact": blob_path,
        "bytes": os.path.getsize(blob_path),
        "platforms": list(exp.platforms),
        "args": "(params, tree_flatten(store)[0] as tuple, batch)"
        if store is not None else "(params, batch)",
        "batch_shapes": {k: list(v.shape) for k, v in dbatch.items()},
        "compute_dtype": cfg.precision,
        "num_beams": cfg.generation.num_beams,
        "max_new_tokens": cfg.generation.max_new_tokens,
    }
    with open(os.path.join(out_dir, "serve_step.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def run_fit_baseline(cfg):
    """Parametric-only baseline fine-tune (reference BartLightning /
    T5Lightning via main.py fit; sotasum/bart_lightning.py:48-244,
    t5_lightning.py:48-232). T5 runs get the "summarize: " prompt prefix
    (data_modules.py:152-155)."""
    import jax
    import jax.numpy as jnp

    from .eval import RougeAccumulator
    from .models.bart import init_bart
    from .models.t5 import init_t5
    from .obs import MetricsLogger
    from .train.baseline import make_seq2seq_train_step, seq2seq_greedy
    from .train.optimizer import build_optimizer
    from .train.trainer import TrainState

    family = cfg.baseline
    assert family in ("bart", "t5"), family
    # T5 prompt prefix must be set BEFORE tokenization
    # (reference data_modules.py:152-155)
    dm, tok = build_data(
        cfg, prompt_prefix="summarize: " if family == "t5" else ""
    )

    init = init_bart if family == "bart" else init_t5
    params = init(jax.random.PRNGKey(cfg.seed), cfg.model.led)
    tx = build_optimizer(cfg.train.lr, cfg.train.warmup_steps,
                         cfg.train.total_steps, grad_clip=cfg.train.grad_clip,
                         mu_dtype=cfg.train.adam_mu_dtype)
    state = TrainState.create(params, tx)
    step = make_seq2seq_train_step(
        family, cfg.model.led, tx, cfg.train.label_smoothing_eps
    )
    log = MetricsLogger(cfg.logging.log_dir, f"{cfg.logging.run_name}_{family}",
                        tensorboard=cfg.logging.tensorboard,
                        mlflow=cfg.logging.mlflow)
    n = 0
    metrics = {}
    while n < cfg.max_steps:
        for batch in dm.batches(cfg.data.batch_size, seed=cfg.seed + n):
            if n >= cfg.max_steps:
                break
            db = {
                "input_ids": jnp.asarray(batch["input_ids"]),
                "attention_mask": jnp.asarray(batch["attention_mask"]),
                "labels": jnp.asarray(batch["labels"]),
            }
            state, metrics = step(state, db)
            log.log(n, metrics)
            n += 1
    # full validation epoch: generate + ROUGE over the whole val split
    # (reference validation loop, bart_lightning.py:126-196)
    acc = RougeAccumulator()
    outputs = []
    for bi, batch in enumerate(
        dm.batches(cfg.data.batch_size, shuffle=False, drop_last=False,
                   split="val")
    ):
        if cfg.eval_max_batches is not None and bi >= cfg.eval_max_batches:
            break
        n_real = len(batch["input_ids"])
        if n_real < cfg.data.batch_size:
            reps = cfg.data.batch_size - n_real
            batch = {
                k: np.concatenate([v, np.repeat(v[:1], reps, axis=0)])
                for k, v in batch.items()
            }
        ids = seq2seq_greedy(
            family, state.params, cfg.model.led,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            max_new_tokens=cfg.generation.max_new_tokens,
        )
        preds = tok.batch_decode(np.asarray(ids))[:n_real]
        refs = tok.batch_decode(batch["labels"])[:n_real]
        acc.add_batch(preds, refs)
        outputs.extend(
            {"prediction": p, "reference": r} for p, r in zip(preds, refs)
        )
    log.dump_outputs(f"baseline_{family}_val_outputs", outputs)
    out = {k: float(v) for k, v in metrics.items()}
    out.update(acc.compute())
    out["steps"] = n
    return out


def _pretrain_setup(cfg):
    """Shared setup of the retriever-pretraining CLI (train AND predict
    modes): config, pretrained-initialized dual encoder, tokenized pairs."""
    import jax

    from .data import (
        load_tokenizer,
        prepare_pretrain_pairs,
        synthetic_multi_x_science,
    )
    from .retriever.contrastive import RetrieverConfig, init_retriever

    rcfg = RetrieverConfig(
        query_enc=cfg.model.query_enc, mips_enc=cfg.model.mips_enc,
        temperature=cfg.retriever.temperature,
        pooling_dim=cfg.retriever.pooling_dim,
        token_loss=cfg.retriever.token_loss,
    )
    params = init_retriever(jax.random.PRNGKey(cfg.seed), rcfg)
    # pretrained dual-encoder init (reference builds the retriever from
    # query_model_name/mips_model_name Longformers,
    # sotasum/retriever_lightning.py:102-140)
    for field, group, enc_cfg in (
        ("query_encoder_weights", "query_encoder", rcfg.query_enc),
        ("mips_encoder_weights", "mips_encoder", rcfg.mips_enc),
    ):
        name = getattr(cfg.model, field)
        if name:
            import warnings

            from .models.hf_import import load_encoder_from_pretrained

            try:
                params[group] = load_encoder_from_pretrained(
                    name, enc_cfg, adapter_name=cfg.model.adapter_name
                )
                print(f"[weights] {group} <- {name}")
            except Exception as e:  # noqa: BLE001
                if os.path.exists(name):
                    raise
                warnings.warn(
                    f"[weights] SKIPPING {field}={name!r}: "
                    f"{type(e).__name__}: {e}", stacklevel=2,
                )

    if cfg.data.source == "synthetic":
        df = synthetic_multi_x_science(cfg.data.n_synthetic)
    else:
        dm, _ = build_data(cfg)
        df = dm.df
    tok = load_tokenizer(cfg.data.tokenizer,
                         vocab_size=cfg.model.query_enc.vocab_size,
                         fallback=cfg.data.tokenizer_fallback)
    pairs = prepare_pretrain_pairs(
        df, tok, tok, mode=cfg.retriever.pair_mode,
        query_max_length=cfg.data.query_max_length,
        mips_max_length=cfg.data.memory_len, seed=cfg.seed,
    )
    return rcfg, params, pairs


def _pretrain_full_kb_validation(params, rcfg, pairs, k, *,
                                 return_details=False):
    """Full-KB validation (reference on_validation_start +
    validation_step, sotasum/retriever_lightning.py:339-416): every
    positive is its own gold document; rank it among the COMPLETE
    encoded pair corpus."""
    from .retriever.validate import validate_retriever

    n = len(pairs["query_input_ids"])
    corpus = {
        "token_ids": np.asarray(pairs["mips_input_ids"]),
        "token_mask": np.asarray(pairs["mips_attention_mask"]),
    }
    row_aids = np.arange(n, dtype=np.int32)[:, None]
    queries = {
        "query_input_ids": np.asarray(pairs["query_input_ids"]),
        "query_attention_mask": np.asarray(pairs["query_attention_mask"]),
    }
    return validate_retriever(
        params, rcfg.query_enc, rcfg.mips_enc, corpus, row_aids,
        queries, gold_aid=np.arange(n, dtype=np.int32),
        gold_counts=np.ones(n, np.int32),
        k=min(k, n), return_details=return_details,
    )


def run_pretrain_retriever(cfg):
    import jax.numpy as jnp

    from .obs import MetricsLogger
    from .train.optimizer import build_optimizer
    from .train.trainer import TrainState, make_retriever_train_step
    from .utils.checkpoint import export_encoders

    rcfg, params, pairs = _pretrain_setup(cfg)
    tx = build_optimizer(cfg.train.lr, cfg.train.warmup_steps,
                         cfg.train.total_steps, grad_clip=cfg.train.grad_clip,
                         mu_dtype=cfg.train.adam_mu_dtype)
    state = TrainState.create(params, tx)
    step_fn = make_retriever_train_step(rcfg, tx)

    n = len(pairs["query_input_ids"])
    log = MetricsLogger(cfg.logging.log_dir, cfg.logging.run_name + "_retriever",
                        tensorboard=cfg.logging.tensorboard,
                        mlflow=cfg.logging.mlflow)
    metrics = {}
    # checkpoint on max average_precision over PERIODIC full-KB
    # validations (reference ModelCheckpoint monitor + per-epoch
    # validation, sotasum/pretrain.py:581-587)
    best_ap = -1.0
    exported = False

    def _validate_and_maybe_export(step):
        nonlocal best_ap, exported
        vm = _pretrain_full_kb_validation(
            state.params, rcfg, pairs, cfg.retriever.eval_k
        )
        log.log(step, vm, prefix="val_")
        if cfg.ckpt_dir and vm["average_precision"] > best_ap:
            export_encoders(
                os.path.join(cfg.ckpt_dir, "encoders.npz"), state.params
            )
            exported = True
        best_ap = max(best_ap, vm["average_precision"])
        return vm

    for step in range(cfg.max_steps):
        # seeded with cfg.seed so two configs with different seeds draw
        # different batch sequences (multi-seed retriever ablations)
        sel = np.random.default_rng(cfg.seed + step).choice(
            n, size=min(cfg.data.batch_size, n), replace=False
        )
        batch = {k: jnp.asarray(v[sel]) for k, v in pairs.items()}
        state, metrics = step_fn(state, batch)
        log.log(step, metrics)
        if cfg.eval_every and (step + 1) % cfg.eval_every == 0 \
                and step + 1 < cfg.max_steps:
            _validate_and_maybe_export(step + 1)

    out = {k: float(v) for k, v in metrics.items()}
    # end-of-run validation; exports only if it beats the best periodic AP
    vm = _validate_and_maybe_export(cfg.max_steps)
    if cfg.ckpt_dir and not exported:
        export_encoders(
            os.path.join(cfg.ckpt_dir, "encoders.npz"), state.params
        )
    if cfg.ckpt_dir and cfg.retriever.hf_export:
        # HF-format handoff (reference save_pretrained export,
        # sotasum/pretrain.py:671-681): torch stacks can reload the
        # trained dual encoders directly
        from .models.hf_export import save_encoder_pretrained

        for group, enc_cfg in (
            ("query_encoder", rcfg.query_enc),
            ("mips_encoder", rcfg.mips_enc),
        ):
            save_encoder_pretrained(
                state.params[group], enc_cfg,
                os.path.join(cfg.ckpt_dir, f"hf_{group}"),
            )
            print(f"[export] {group} -> {cfg.ckpt_dir}/hf_{group}")
    out.update({f"val_{k_}": v for k_, v in vm.items()})
    out["best_average_precision"] = best_ap
    return out


def run_pretrain_retriever_test(cfg):
    """Test mode of the pretraining CLI (reference
    `python -m sotasum.pretrain --mode test`, sotasum/pretrain.py:632-681):
    evaluate a SAVED retriever checkpoint (encoders.npz) against the full
    knowledge base — no training. The reference additionally exports the
    encoders in test mode; here export already happened at train time, so
    test is a pure evaluation of that artifact."""
    from .obs import MetricsLogger

    rcfg, params, pairs = _pretrain_setup(cfg)
    enc_path = (
        os.path.join(cfg.ckpt_dir, "encoders.npz") if cfg.ckpt_dir else None
    )
    if enc_path and os.path.exists(enc_path):
        from .utils.checkpoint import import_encoders

        params = import_encoders(enc_path, params)
        print(f"[weights] query/mips encoders <- {enc_path}")
    else:
        print("[weights] no encoders.npz found; evaluating the "
              "pretrained/seed-initialized encoders")
    vm = _pretrain_full_kb_validation(
        params, rcfg, pairs, cfg.retriever.eval_k
    )
    MetricsLogger(
        cfg.logging.log_dir, cfg.logging.run_name + "_retriever"
    ).log(0, vm, prefix="test_")
    out = {f"test_{k}": float(v) for k, v in vm.items()}
    out["n_queries"] = len(pairs["query_input_ids"])
    return out


def run_pretrain_retriever_predict(cfg):
    """Predict mode of the pretraining CLI (reference
    `python -m sotasum.pretrain --mode predict`, sotasum/pretrain.py:
    686-718): load the exported encoders if available, run the full-KB
    top-k search over the pair corpus, dump the per-query ranking."""
    from .obs import MetricsLogger

    rcfg, params, pairs = _pretrain_setup(cfg)
    enc_path = (
        os.path.join(cfg.ckpt_dir, "encoders.npz") if cfg.ckpt_dir else None
    )
    if enc_path and os.path.exists(enc_path):
        from .utils.checkpoint import import_encoders

        params = import_encoders(enc_path, params)
        print(f"[weights] query/mips encoders <- {enc_path}")
    vm, details = _pretrain_full_kb_validation(
        params, rcfg, pairs, cfg.retriever.eval_k, return_details=True
    )
    dump = [
        {
            "query": int(i),
            "retrieved": details["indices"][i].tolist(),
            "scores": [round(float(s), 6) for s in details["scores"][i]],
            "hits": details["hits"][i].astype(int).tolist(),
        }
        for i in range(len(details["indices"]))
    ]
    MetricsLogger(
        cfg.logging.log_dir, cfg.logging.run_name + "_retriever"
    ).dump_outputs("retriever_predictions", dump)
    out = dict(vm)
    out["n_queries"] = len(dump)
    return out


def run_build_index(cfg, out_dir: str):
    import jax

    from .index.flat import save_flat_index
    from .models.retriever_generator import init_rag_pretrained

    dm, _ = build_data(cfg)
    params = init_rag_pretrained(jax.random.PRNGKey(cfg.seed), cfg.model)
    store = build_store(params, cfg, dm)
    from .index.flat import FlatIndex

    if isinstance(store.index, FlatIndex):
        save_flat_index(store.index, out_dir)
    else:
        from .index.ivf import save_ivf_index

        save_ivf_index(store.index, out_dir)
    tok_arrays = {
        "token_ids": np.asarray(store.token_ids),
        "token_mask": np.asarray(store.token_mask),
    }
    if store.row_aids is not None:
        tok_arrays["row_aids"] = np.asarray(store.row_aids)
    np.savez(os.path.join(out_dir, "corpus_tokens.npz"), **tok_arrays)
    return {"n": store.index.n, "out": out_dir}


def run_bench_index(cfg):
    """Index benchmarks beyond the driver's one-line bench.py: build time
    (embed + cluster, the BASELINE.md third metric), flat vs IVF recall,
    and queries/sec, on a corpus shaped like the config.

    The corpus is drawn from an anisotropic Gaussian mixture with
    power-law component sizes, not an i.i.d. Gaussian: encoder embedding
    sets are strongly clustered, and isotropic noise flatters IVF recall
    (every centroid captures equal mass). Queries are perturbed corpus
    rows — the nearest-neighbor regime retrieval actually runs in."""
    import jax
    import jax.numpy as jnp

    from .index import build_flat_index, build_ivf_index, ivf_search, search
    from .utils.cpu_baseline import cpu_mips_search

    rng = np.random.default_rng(cfg.seed)
    n = cfg.data.mips_db_max_size or 65536
    d = cfg.model.mips_enc.d_model
    b, k = 64, 10
    n_comp = max(32, n // 512)
    centers = 3.0 * rng.standard_normal((n_comp, d)).astype(np.float32)
    # power-law component masses (real corpora have dominant topics)
    w = 1.0 / np.arange(1, n_comp + 1)
    comp = rng.choice(n_comp, size=n, p=w / w.sum())
    scales = (0.5 + rng.random((n_comp, d))).astype(np.float32)  # anisotropy
    x = centers[comp] + scales[comp] * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    q = x[rng.integers(0, n, b)] + 0.1 * rng.standard_normal(
        (b, d)
    ).astype(np.float32)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    out: dict[str, Any] = {"n": n, "d": d}

    t0 = time.perf_counter()
    flat = build_flat_index(x, dtype=dtype)
    jax.block_until_ready(flat.embeddings)
    out["flat_build_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    nc = min(256, max(1, n // 64))
    # keep_flat=False so the recall numbers below measure the PROBED path
    # (with the flat sibling, B·nprobe ≥ C batches route to exact flat
    # search and every recall would read 1.0)
    ivf = build_ivf_index(x, n_clusters=nc, dtype=dtype,
                          train_size=min(n, 16384), iters=5, keep_flat=False)
    jax.block_until_ready(ivf.clustered)
    out["ivf_build_cold_s"] = round(time.perf_counter() - t0, 3)
    # steady-state rebuild (the train-time refresh cost; executables warm)
    t0 = time.perf_counter()
    ivf = build_ivf_index(x, n_clusters=nc, dtype=dtype,
                          train_size=min(n, 16384), iters=5, keep_flat=False)
    jax.block_until_ready(ivf.clustered)
    out["ivf_rebuild_warm_s"] = round(time.perf_counter() - t0, 3)

    _, ref = cpu_mips_search(x, q, k)
    _, fi = search(flat, jnp.asarray(q), k=k)
    fi = np.asarray(fi)
    out["flat_recall"] = round(
        sum(len(set(fi[i]) & set(ref[i])) for i in range(b)) / (b * k), 4
    )
    for nprobe in (8, 32):
        _, ii = ivf_search(ivf, jnp.asarray(q), k=k, nprobe=nprobe)
        ii = np.asarray(ii)
        out[f"ivf_recall_nprobe{nprobe}"] = round(
            sum(len(set(ii[i]) & set(ref[i])) for i in range(b)) / (b * k), 4
        )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="retrieval_augmented_mds_tpu")
    p.add_argument(
        "command",
        choices=[
            "fit", "validate", "test", "predict", "pretrain-retriever",
            "build-index", "bench-index", "export",
        ],
    )
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="./index_out")
    p.add_argument(
        "--index", default=None, metavar="DIR",
        help="validate/test/predict/export: load this persisted "
        "build-index directory instead of re-embedding the corpus "
        "(reference Mips.load, sotasum/mips.py:545-549)",
    )
    p.add_argument(
        "--profile", action="store_true",
        help="capture a jax profiler trace of the run into <log_dir>/trace",
    )
    p.add_argument(
        "--mode", choices=["train", "test", "predict"], default="train",
        help="pretrain-retriever only: test = full-KB metrics for a saved "
        "encoders.npz (no training); predict = top-k search dump with "
        "the exported encoders (reference `python -m sotasum.pretrain "
        "--mode {test,predict}`)",
    )
    args = p.parse_args(argv)

    from .utils.config import ExperimentConfig, load_config
    from .models.retriever_generator import RAGConfig

    cfg = (
        load_config(args.config)
        if args.config
        else ExperimentConfig(model=RAGConfig.tiny())
    )

    if cfg.compilation_cache_dir:
        # persistent XLA compile cache (production analog of the test
        # suite's /tmp/jax_test_cache): cuts IVF/LED cold-build compile
        # time on every run after the first
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          cfg.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.command == "fit":
        runner = run_fit_baseline if cfg.baseline else run_fit
        if args.profile:
            from .obs import trace

            with trace(os.path.join(cfg.logging.log_dir, "trace")):
                out = runner(cfg)
        else:
            out = runner(cfg)
    elif args.command in ("validate", "test"):
        out = run_validate(
            cfg, split="test" if args.command == "test" else "val",
            index_dir=args.index,
        )
    elif args.command == "predict":
        out = run_predict(cfg, index_dir=args.index)
    elif args.command == "pretrain-retriever":
        if args.mode == "predict":
            out = run_pretrain_retriever_predict(cfg)
        elif args.mode == "test":
            out = run_pretrain_retriever_test(cfg)
        else:
            out = run_pretrain_retriever(cfg)
    elif args.command == "build-index":
        out = run_build_index(cfg, args.out)
    elif args.command == "export":
        out = run_export(cfg, args.out, index_dir=args.index)
    else:
        out = run_bench_index(cfg)
    print(json.dumps(out, default=str)[:2000])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
