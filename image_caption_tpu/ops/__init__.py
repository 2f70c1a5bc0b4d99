"""TPU ops: attention (XLA + fused Pallas kernels) and mask builders."""

from .attention import fused_attention, masked_softmax, sdp_attention  # noqa: F401
from . import masks  # noqa: F401
