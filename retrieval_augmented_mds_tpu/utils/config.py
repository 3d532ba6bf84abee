"""Typed config system: dataclasses hydrated from YAML.

Replaces the reference's three stacked mechanisms (SURVEY.md §5.6 —
LightningCLI/jsonargparse YAML, the 82-field ModelConfig dataclass, and
per-CLI argparse) with one: every subsystem keeps its own frozen dataclass
(RAGConfig, TrainHyper, GenerationOptions, ...) and `ExperimentConfig`
composes them; YAML maps onto the dataclass tree field-by-field. The
resolved config is written back next to the run artifacts (the
`save_config_kwargs={"overwrite": True}` behavior of main.py:19).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import yaml

from ..models.config import EncoderConfig, Seq2SeqConfig
from ..models.generate import GenerationOptions
from ..models.retriever_generator import RAGConfig
from ..train.trainer import TrainHyper


@dataclasses.dataclass(frozen=True)
class DataConfig:
    source: str = "synthetic"  # "synthetic" | "multi_x_science" | path
    dataset_mode: str = "original"  # original | aggregated | dual (model_config.py:75)
    corpus_column: str = "ref_abstract"  # corpus text column (model_config.py:59)
    # MIPS corpus source (reference mips_dataset, model_config.py:58 /
    # mips.py:167-182): multi_x_science | arxiv2 | arxiv_x_science; the
    # arXiv variants read mips_arxiv_path (parquet)
    mips_dataset: str = "multi_x_science"
    mips_arxiv_path: str | None = None
    tokenizer: str | None = None  # HF name; None → hash tokenizer
    tokenizer_fallback: str = "error"  # "error" | "hash" on load failure
    doc_sep: str = "<DOC_SEP>"  # model_config.py:78
    max_length: int = 1024
    query_max_length: int = 256
    decoder_max_length: int = 256
    memory_len: int = 128
    n_synthetic: int = 64  # smoke-corpus size (no_mips.yaml:124 uses 64)
    source_memory: bool = False  # model_config.py:82
    batch_size: int = 4
    mips_db_max_size: int | None = None  # corpus truncation (model_config.py:66)
    # tokenize-once cache dir (reference prepare_data → save_to_disk →
    # load_from_disk, data_modules.py:84,268); None = tokenize in memory
    cache_dir: str | None = None


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    factory: str = "Flat"  # mips_string_factory (model_config.py:50)
    metric: str = "ip"  # mips_metric_type (model_config.py:54)
    normalize: bool = False  # mips_normalize (model_config.py:55)
    nprobe: int = 8  # mips_nprobe (model_config.py:51)
    train_size: int | None = None  # mips_train_size (model_config.py:53)
    dtype: str = "bfloat16"
    rebuild_every: int = 650  # mips_rebuild_every (no_mips.yaml:114)


@dataclasses.dataclass(frozen=True)
class RetrieverPretrainConfig:
    """pretrain-retriever knobs (reference RetrieverConfig,
    sotasum/retriever_lightning.py:27-51, + pair-mode dataset selection at
    sotasum/pretrain.py:268-299)."""

    temperature: float = 1.0
    pooling_dim: int | None = None  # 128-d projections (:142-153)
    token_loss: bool = False  # BOW auxiliary loss (:155-163)
    pair_mode: str = "abstract"  # abstract↔cited-ref | "related" (abstract↔related_work)
    eval_k: int = 10  # top-k for full-KB validation metrics
    # also export the trained encoders as `transformers`-loadable
    # LongformerModel directories (models/hf_export.py — the
    # save_pretrained handoff of reference pretrain.py:671-681)
    hf_export: bool = False


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int | None = None  # None → auto factorization
    shard: int | None = None


@dataclasses.dataclass(frozen=True)
class LoggingConfig:
    log_dir: str = "./runs"
    run_name: str = "run"
    teams_webhook: str | None = None
    # mirror scalars into standard TensorBoard event files under
    # <log_dir>/tb/<run_name> (obs/tb.py — the reference's TB logger,
    # config/no_mips.yaml:18-25); JSONL stays the primary sink
    tensorboard: bool = False
    # mirror scalars + hyperparams into an mlflow FILE-STORE layout under
    # <log_dir>/mlruns (obs/mlflow.py — the reference's MLFlowLogger with
    # a file tracking URI, config/no_mips.yaml:18-25); browsable by a
    # stock `mlflow ui --backend-store-uri <log_dir>/mlruns`
    mlflow: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: RAGConfig
    train: TrainHyper = TrainHyper()
    generation: GenerationOptions = GenerationOptions()
    data: DataConfig = DataConfig()
    index: IndexConfig = IndexConfig()
    retriever: RetrieverPretrainConfig = RetrieverPretrainConfig()
    mesh: MeshConfig = MeshConfig()
    logging: LoggingConfig = LoggingConfig()
    seed: int = 0
    precision: str = "float32"  # "bfloat16" on TPU (reference "16-mixed")
    max_steps: int = 100
    eval_every: int = 50
    # cap on in-training validation epochs (reference limit_val_batches,
    # no_mips.yaml:46-49); None = full split. `validate`/`test` commands
    # always stream the full split.
    eval_max_batches: int | None = None
    ckpt_dir: str | None = None
    baseline: str | None = None  # "bart" | "t5" → parametric-only fine-tune
    # opt-in persistent XLA compile cache for production runs (the CLI
    # wires it via jax.config; tests use /tmp/jax_test_cache separately)
    compilation_cache_dir: str | None = None


_REGISTRY = {
    "model": RAGConfig,
    "led": Seq2SeqConfig,
    "query_enc": EncoderConfig,
    "mips_enc": EncoderConfig,
    "memory_enc": EncoderConfig,
    "train": TrainHyper,
    "generation": GenerationOptions,
    "data": DataConfig,
    "index": IndexConfig,
    "retriever": RetrieverPretrainConfig,
    "mesh": MeshConfig,
    "logging": LoggingConfig,
}

_PRESETS = {
    "tiny": lambda: RAGConfig.tiny(),
    "led_base": lambda: RAGConfig(
        led=Seq2SeqConfig.led_base(),
        query_enc=EncoderConfig.longformer_base(),
        mips_enc=EncoderConfig.longformer_base(),
        memory_enc=EncoderConfig.longformer_base(),
    ),
    "led_large": lambda: RAGConfig(
        led=Seq2SeqConfig.led_large(),
        query_enc=EncoderConfig.longformer_large(),
        mips_enc=EncoderConfig.longformer_large(),
        memory_enc=EncoderConfig.longformer_large(),
    ),
}


def _hydrate(cls, d: dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"{cls.__name__} has no field {k!r}")
        if isinstance(v, dict) and k in _REGISTRY:
            kwargs[k] = _hydrate(_REGISTRY[k], v)
        else:
            kwargs[k] = tuple(v) if isinstance(v, list) and k == "frozen_groups" else v
    return cls(**kwargs)


def config_from_dict(d: dict[str, Any]) -> ExperimentConfig:
    d = dict(d)
    model_d = dict(d.pop("model", {}))
    preset = model_d.pop("preset", "tiny")
    base = _PRESETS[preset]()
    sub = {}
    for enc_key in ("led", "query_enc", "mips_enc", "memory_enc"):
        if enc_key in model_d:
            cls = _REGISTRY[enc_key]
            cur = dataclasses.asdict(getattr(base, enc_key))
            cur.update(model_d.pop(enc_key))
            sub[enc_key] = cls(**cur)
    model = dataclasses.replace(base, **sub, **model_d)
    rest = {
        k: _hydrate(_REGISTRY[k], v) if k in _REGISTRY and isinstance(v, dict)
        else v
        for k, v in d.items()
    }
    return ExperimentConfig(model=model, **rest)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return config_from_dict(yaml.safe_load(f) or {})


def save_config(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
