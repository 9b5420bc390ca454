from .metrics import average_epe, endpoint_error, angular_error
from .timing import PhaseTimer, warmup, time_fn

__all__ = ["average_epe", "endpoint_error", "angular_error", "PhaseTimer",
           "warmup", "time_fn"]
