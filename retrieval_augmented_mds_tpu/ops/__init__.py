from .mips_topk import mips_topk, mips_topk_xla  # noqa: F401
