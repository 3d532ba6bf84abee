from .loss import (  # noqa: F401
    label_smoothed_nll_loss_copy,
    label_smoothed_nll_loss_custom,
    label_smoothed_nll_loss_fairseq,
    label_smoothed_nll_loss_transformers,
    summarization_loss,
)
from .optimizer import build_optimizer, linear_warmup_schedule  # noqa: F401
