from .augment import augment_queries, augment_corpus  # noqa: F401
from .flat import FlatIndex, build_flat_index, search  # noqa: F401
from .factory import build_index_from_factory, parse_factory  # noqa: F401
from .ivf import IVFIndex, build_ivf_index, ivf_search, kmeans  # noqa: F401
