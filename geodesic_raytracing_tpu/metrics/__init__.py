from .base import (
    BASE_CONFIGS,
    Metric,
    MetricConfig,
    REGISTRY,
    get_metric,
    list_metrics,
    make_config,
    register,
)

# Importing the catalogue modules populates the registry (the analogue of the
# reference's content scan over scripts/*.js, content_manager.cpp:181-261).
from . import catalogue_simple  # noqa: F401
from . import catalogue_kerr  # noqa: F401
from . import catalogue_exotic  # noqa: F401
from . import catalogue_multibody  # noqa: F401

__all__ = [
    "BASE_CONFIGS",
    "Metric",
    "MetricConfig",
    "REGISTRY",
    "get_metric",
    "list_metrics",
    "make_config",
    "register",
]
