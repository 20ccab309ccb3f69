from . import geometry, tetrad

__all__ = ["geometry", "tetrad"]
