from .calib import get_sample_datas_for_quantization, get_loaders

__all__ = ["get_sample_datas_for_quantization", "get_loaders"]
