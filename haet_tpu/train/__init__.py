from .checkpoint import Checkpointer  # noqa: F401
from .losses import RelLpLoss, central_diff, mse_press_velo, zero_boundary  # noqa: F401
from .normalizer import (  # noqa: F401
    IdentityTransformer,
    StreamingNormalizer,
    UnitGaussianNormalizer,
    UnitTransformer,
)
from .trainer import (  # noqa: F401
    EarlyStopping,
    MetricsLogger,
    Trainer,
    TrainState,
    make_optimizer,
    make_schedule,
)
