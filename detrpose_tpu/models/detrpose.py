"""DETRPose top module: backbone -> hybrid encoder -> pose transformer.

Reference: src/models/detrpose/detrpose.py:15-81. ``deploy()`` in the reference
is module surgery; here deploy is a module flag + a params transform
(utils/deploy.py) — the jitted eval function is the deployment artifact.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import flax.linen as nn

from .hgnetv2 import HGNetv2
from .hybrid_encoder import HybridEncoder
from .transformer import Transformer


class DETRPose(nn.Module):
    backbone: HGNetv2
    encoder: HybridEncoder
    transformer: Transformer

    def __call__(
        self,
        samples: jax.Array,  # (B, H, W, 3) NHWC, normalized to [0, 1]
        train: bool = False,
        dn: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, Any]:
        feats = self.backbone(samples, train)
        feats = self.encoder(feats, train)
        return self.transformer(feats, train, dn)
