from .auto import AutoQuantizedModelForCausalLM
from .qconfig_io import BaseQuantizeConfig

__all__ = ["AutoQuantizedModelForCausalLM", "BaseQuantizeConfig"]
