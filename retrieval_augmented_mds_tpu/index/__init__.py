from .augment import augment_queries, augment_corpus  # noqa: F401
from .flat import FlatIndex, build_flat_index, search  # noqa: F401
from .factory import build_index_from_factory, parse_factory  # noqa: F401
from .ivf import IVFIndex, build_ivf_index, ivf_search, kmeans  # noqa: F401


def load_index(path: str, *, mesh=None):
    """Load a persisted index directory (save_flat_index / save_ivf_index
    output), dispatching on the meta kind — the one-call analog of
    reference `Mips.load` (sotasum/mips.py:545-549). With ``mesh`` the
    payload is shard-placed exactly like a fresh mesh build."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        kind = json.load(f).get("kind", "flat")
    if kind == "ivf":
        from .ivf import load_ivf_index, shard_ivf_index

        idx = load_ivf_index(path)
        return idx if mesh is None else shard_ivf_index(idx, mesh)
    from .flat import load_flat_index

    return load_flat_index(path, mesh=mesh)
