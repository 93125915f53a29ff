"""MobileDet backbones (placeholder this milestone).

Parity target: reference retinanet/model/backbone/mobiledet.py (cpu / dsp /
edge_tpu / gpu variants from inverted-bottleneck, fused-conv, tucker-conv
and SE blocks). Implemented later in this round; raises until then.
"""

from __future__ import annotations

from flax import linen as nn


class MobileDet(nn.Module):
    """Not yet implemented — see module docstring."""
    variant: str = "edge_tpu"

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "MobileDet backbone is not implemented yet in this build. "
            "Use the 'resnet' backbone.")
