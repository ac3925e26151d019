from .exporter import export_model, verify_correctness

__all__ = ["export_model", "verify_correctness"]
