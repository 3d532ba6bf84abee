from .contrastive import (  # noqa: F401
    bow_loss,
    contrastive_loss,
    init_bow,
    init_retriever,
    retriever_forward,
)
from .metrics import retriever_metrics, retriever_metrics_fixed  # noqa: F401
