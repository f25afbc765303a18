"""Attention / FeedForward / AdaLayerNorm re-implementations with
diffusers' documented semantics (GEGLU: value-half * exact-gelu(gate-half);
ff.net = [GEGLU, Dropout, Linear] so checkpoint keys are ff.net.0.proj and
ff.net.2)."""
import torch
import torch.nn as nn
import torch.nn.functional as F

from .attention_processor import Attention  # noqa: F401  (re-export)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False):
        super().__init__()
        inner = int(dim * mult)
        dim_out = dim_out or dim
        assert activation_fn == "geglu", activation_fn
        self.net = nn.ModuleList([
            GEGLU(dim, inner),
            nn.Dropout(dropout),
            nn.Linear(inner, dim_out),
        ])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, x):
        for module in self.net:
            x = module(x)
        return x


class AdaLayerNorm(nn.Module):
    """Unused by ASVA configs (num_embeds_ada_norm is always None)."""

    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("AdaLayerNorm is never instantiated by "
                                  "ASVA configs")


class AdaLayerNormZero(AdaLayerNorm):
    def __init__(self, *a, **k):  # noqa: D401
        nn.Module.__init__(self)
        raise NotImplementedError
