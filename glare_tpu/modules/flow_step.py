"""One Glow step: ActNorm -> InvertibleConv1x1 -> (optional) conditional
coupling (reference: FlowStep.py:18-127).

Supported permutations: 'invconv' (the only one exercised by shipped confs).
Supported couplings: 'CondAffineSeparatedAndCond', 'noCoupling'.
"""

from __future__ import annotations

from flax import linen as nn

from .coupling import CondAffineSeparatedAndCond
from .flow_layers import ActNorm2d, InvertibleConv1x1


class FlowStep(nn.Module):
    in_channels: int
    hidden_channels: int = 64
    actnorm_scale: float = 1.0
    flow_permutation: str = "invconv"
    flow_coupling: str = "CondAffineSeparatedAndCond"
    in_channels_rrdb: int = 64
    le_curve: bool = False

    @nn.compact
    def __call__(self, z, logdet=None, reverse=False, ft=None, ddinit=False):
        assert self.flow_permutation == "invconv", self.flow_permutation
        actnorm = ActNorm2d(self.in_channels, self.actnorm_scale, name="actnorm")
        invconv = InvertibleConv1x1(self.in_channels, name="invconv")
        coupling = None
        if self.flow_coupling == "CondAffineSeparatedAndCond":
            coupling = CondAffineSeparatedAndCond(
                in_channels=self.in_channels,
                in_channels_rrdb=self.in_channels_rrdb,
                hidden_channels=self.hidden_channels,
                le_curve=self.le_curve,
                name="affine",
            )
        elif self.flow_coupling != "noCoupling":
            raise ValueError(f"coupling not found: {self.flow_coupling}")

        if not reverse:
            z, logdet = actnorm(z, logdet, reverse=False, ddinit=ddinit)
            z, logdet = invconv(z, logdet, reverse=False)
            if coupling is not None:
                z, logdet = coupling(z, logdet, reverse=False, ft=ft, ddinit=ddinit)
        else:
            if coupling is not None:
                z, logdet = coupling(z, logdet, reverse=True, ft=ft, ddinit=ddinit)
            z, logdet = invconv(z, logdet, reverse=True)
            z, logdet = actnorm(z, logdet, reverse=True, ddinit=ddinit)
        return z, logdet
