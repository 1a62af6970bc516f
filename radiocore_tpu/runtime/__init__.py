"""Runtime layer: platform probing, configuration, metrics.

TPU-native replacement for the reference's backend-injection layer
(reference: ``radiocore/_internal/injector.py:6-29``). Instead of swapping
numpy/cupy module objects at runtime, every op here is written once in
``jax.numpy`` and dispatched by XLA to whatever platform is active; the
only runtime decision left is mesh/topology setup.
"""

from radiocore_tpu.runtime.platform import has_tpu, HasTpu, platform_summary
from radiocore_tpu.runtime.config import PipelineConfig, StationConfig, MeshConfig
from radiocore_tpu.runtime.metrics import Metrics

__all__ = [
    "has_tpu", "HasTpu", "platform_summary",
    "PipelineConfig", "StationConfig", "MeshConfig", "Metrics",
]
