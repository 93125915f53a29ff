"""EfficientNet backbones (placeholder this milestone).

Parity target: reference retinanet/model/backbone/efficientnet.py (b0-l2 and
lite0-lite4, MBConv + SE + fused/superpixel variants, width/depth rounding).
Implemented later in this round; the builder raises until then.
"""

from __future__ import annotations

from flax import linen as nn


class EfficientNet(nn.Module):
    """Not yet implemented — see module docstring."""

    @classmethod
    def from_name(cls, model_name: str, **kwargs) -> "EfficientNet":
        raise NotImplementedError(
            "EfficientNet backbone is not implemented yet in this build. "
            "Use the 'resnet' backbone.")
