from .engine import (
    ContinuousBatchingEngine,
    Request,
    SamplingParams,
    ServeConfig,
)
from .tp_engine import TPEngine

__all__ = [
    "ContinuousBatchingEngine",
    "Request",
    "SamplingParams",
    "ServeConfig",
    "TPEngine",
]
