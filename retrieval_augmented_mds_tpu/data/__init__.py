from .corpus import (  # noqa: F401
    aggregate_by_aid,
    build_mips_corpus,
    load_multi_x_science,
    strip_cites,
    synthetic_multi_x_science,
)
from .tokenizer import HashTokenizer, load_tokenizer  # noqa: F401
from .pipeline import (  # noqa: F401
    RAGDataModule,
    prepare_memory_store_arrays,
    prepare_pretrain_pairs,
    prepare_rag_examples,
)
