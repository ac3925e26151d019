"""Run-once singleton logger (reference utils/logger.py:12-21)."""

import logging

_LOGGER = None


def get_logger(name: str = "qllm_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler()
            h.setFormatter(
                logging.Formatter("%(asctime)s %(name)s [%(levelname)s] %(message)s")
            )
            logger.addHandler(h)
        logger.setLevel(logging.INFO)
        _LOGGER = logger
    return _LOGGER
