"""retrieval_augmented_mds_tpu — TPU-native retrieval-augmented multi-document
summarization framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capability surface of
`florianbaud/retrieval-augmented-mds` ("sotasum": non-parametric memory
guidance for multi-document summarization, RANLP 2023):

  * a sharded, HBM-resident MIPS index engine (Pallas fused matmul + on-chip
    k-select; IVF-style clustered variant) replacing FAISS
    (reference: sotasum/mips.py),
  * a long-context encoder-decoder model family (Longformer-style sliding
    window + global attention; LED-style generator) replacing the HF
    torch stacks (reference: sotasum/retriever_generator.py),
  * memory-guided copy decoding (score-biased cross attention, per-token
    copy/generate gating) (reference: sotasum/decoder.py, decoder_own.py),
  * contrastive retriever pretraining (reference: sotasum/retriever_lightning.py,
    sotasum/pretrain.py),
  * a pjit/shard_map training loop with data parallelism, ZeRO-style
    optimizer-state sharding, and train-time double-buffered index refresh
    (reference: sotasum/lightning_model.py),
  * host-side Arrow data pipeline for Multi-XScience / arXiv corpora
    (reference: sotasum/data_loaders.py, data_modules.py).

Layout:
  parallel/  mesh bootstrap, sharding rules, collectives
  ops/       Pallas TPU kernels (MIPS top-k, sliding-window attention)
  index/     the non-parametric memory: flat + IVF MIPS engines, persistence
  models/    pure-JAX transformer library (Longformer, LED, copy decoders)
  retriever/ dual-encoder contrastive pretraining + retrieval metrics
  train/     losses, sharded optimizer, train step, index-refresh loop
  data/      corpus builders, tokenization, memory-forcing modes
  eval/      ROUGE + generation evaluation
  obs/       logging, callbacks, profiling
  utils/     config system, checkpointing, misc
"""

__version__ = "0.1.0"
