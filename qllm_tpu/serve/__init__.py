from .engine import ContinuousBatchingEngine, Request, ServeConfig

__all__ = ["ContinuousBatchingEngine", "Request", "ServeConfig"]
