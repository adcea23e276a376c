"""Graph data layer: mutable graphs, tensor form, conversion, batching."""

from grafx_tpu.data.batch import batch_grafx
from grafx_tpu.data.configs import UTILITY_TYPES, NodeConfigs
from grafx_tpu.data.conversion import convert_to_tensor
from grafx_tpu.data.graph import GRAFX
from grafx_tpu.data.tensor import GRAFXTensor

__all__ = [
    "GRAFX",
    "GRAFXTensor",
    "NodeConfigs",
    "UTILITY_TYPES",
    "batch_grafx",
    "convert_to_tensor",
]
