from .augment import augment_queries, augment_corpus  # noqa: F401
from .flat import FlatIndex, build_flat_index, search  # noqa: F401
