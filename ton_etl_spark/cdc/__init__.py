from .pipeline import CdcPipeline, apply_batch
from .dispatch import ParserRegistry, default_registry

__all__ = ["CdcPipeline", "apply_batch", "ParserRegistry", "default_registry"]
