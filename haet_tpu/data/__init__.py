from . import pde_datasets, synthetic  # noqa: F401
from .synthetic import batch_iter  # noqa: F401
from .prefetch import Prefetcher  # noqa: F401
