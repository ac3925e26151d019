from .run import CustomModel

__all__ = ["CustomModel"]
