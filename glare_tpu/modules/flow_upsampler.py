"""FlowUpsamplerNet: the conditional-flow graph builder
(reference: FlowUpsamplerNet.py:17-339).

For the shipped GLARE confs (scale=1, L=2, K=12, additionalFlowNoAffine=2,
split disabled, no squeeze layers) this builds, per level:

    2 x FlowStep(noCoupling)  +  K x FlowStep(CondAffineSeparatedAndCond)

all at the latent resolution with 3 channels, every coupling conditioned on
``rrdbResults['cond_feat']`` (levelToName={2:'cond_feat'} at scale 1,
reference lines 68-71).

The reference also constructs an ``f = f_conv2d_bias`` head (lines 111-114)
that is never used in forward; it is intentionally not replicated.

encode() walks the steps forward accumulating +logdet, decode() walks them
reversed with -logdet. Exact invertibility and logdet antisymmetry are
property-tested in tests/test_flow.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from flax import linen as nn

from .flow_step import FlowStep
from .split import Split2d


class FlowUpsamplerNet(nn.Module):
    in_channels: int = 3
    hidden_channels: int = 64
    K: int = 12
    L: int = 2
    additional_flow_no_affine: int = 2
    flow_coupling: str = "CondAffineSeparatedAndCond"
    in_channels_rrdb: int = 64  # conditionInFeaDim
    split_enable: bool = False
    split_consume_ratio: float = 0.5
    split_logs_eps: float = 0.0
    sigmoid_output: bool = False
    le_curve: bool = False

    def setup(self):
        steps = []
        kinds = []
        C = self.in_channels
        for level in range(1, self.L + 1):
            for _ in range(self.additional_flow_no_affine):
                steps.append(
                    FlowStep(
                        in_channels=C,
                        hidden_channels=self.hidden_channels,
                        flow_coupling="noCoupling",
                    )
                )
                kinds.append("step")
            for _ in range(self.K):
                steps.append(
                    FlowStep(
                        in_channels=C,
                        hidden_channels=self.hidden_channels,
                        flow_coupling=self.flow_coupling,
                        in_channels_rrdb=self.in_channels_rrdb,
                        le_curve=self.le_curve,
                    )
                )
                kinds.append("step")
            if self.split_enable and level < self.L:
                split = Split2d(
                    num_channels=C,
                    consume_ratio=self.split_consume_ratio,
                    logs_eps=self.split_logs_eps,
                )
                steps.append(split)
                kinds.append("split")
                C = C - int(round(C * self.split_consume_ratio))
        self.layers = steps
        self._layer_kinds = tuple(kinds)
        self.C_out = C

    def __call__(self, z, rrdbResults=None, logdet=None, reverse=False, epses=None,
                 eps_std=None, ddinit=False, rng=None):
        if reverse:
            return self.decode(z, rrdbResults, logdet=logdet, epses=epses,
                               eps_std=eps_std, rng=rng)
        return self.encode(z, rrdbResults, logdet=logdet, epses=epses, ddinit=ddinit)

    def _ft(self, rrdbResults):
        if rrdbResults is None:
            return None
        if isinstance(rrdbResults, dict):
            return rrdbResults["cond_feat"]
        return rrdbResults

    def encode(self, gt, rrdbResults=None, logdet=None, epses=None, ddinit=False):
        ft = self._ft(rrdbResults)
        z = gt
        eps_list = [] if isinstance(epses, list) else None
        for layer, kind in zip(self.layers, self._layer_kinds):
            if kind == "step":
                z, logdet = layer(z, logdet, reverse=False, ft=ft, ddinit=ddinit)
            else:
                z, logdet, eps = layer(z, logdet, reverse=False, ft=None)
                if eps_list is not None:
                    eps_list.append(eps)
        if eps_list is not None:
            eps_list.append(z)
            return eps_list, logdet
        return z, logdet

    def decode(self, z, rrdbResults=None, logdet=None, epses=None, eps_std=None, rng=None):
        ft = self._ft(rrdbResults)
        if isinstance(epses, list):
            epses = list(epses)
            z = epses.pop()
        x = z
        for layer, kind in zip(reversed(self.layers), reversed(self._layer_kinds)):
            if kind == "step":
                x, logdet = layer(x, logdet, reverse=True, ft=ft)
            else:
                eps = epses.pop() if isinstance(epses, list) else None
                x, logdet, _ = layer(
                    x, logdet, reverse=True, eps=eps, eps_std=eps_std, ft=None, rng=rng
                )
        if self.sigmoid_output:
            import jax

            x = jax.nn.sigmoid(x)
        return x, logdet
