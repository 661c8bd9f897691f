"""End-to-end conversion parity for reference SigLIP2_MTL checkpoints:
HF vision tower + 3-class head + SegFormer decoder assembled in torch with
reference key naming → tpudf MTL bundle → identical (cls, seg) outputs."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
import torch.nn as nn
import torch.nn.functional as TF

import jax.numpy as jnp

from tests.test_segformer_oracle import TorchDecoder
from tpudf.core.precision import F32_POLICY
from tpudf.models.convert import config_from_hf, from_reference_mtl_state_dict
from tpudf.models.segformer import MTLConfig, mtl_forward


class LinearProj(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.proj = nn.Linear(i, o)

    def forward(self, x):
        return self.proj(x)


class TorchMTL(nn.Module):
    """Reference SigLIP2_MTL assembly (siglip2siddataset.py:750-786) with the
    same attribute names so state_dict keys match."""

    def __init__(self, hf_cfg, seg_layers=(0, -1), embed_dim=16):
        super().__init__()
        self.encoder = transformers.SiglipVisionModel(hf_cfg)
        hid = hf_cfg.hidden_size
        self.cls_head = nn.Linear(hid, 3)
        self.seg_layers = seg_layers
        self.decoder = TorchDecoder([hid] * len(seg_layers), embed_dim)
        # rename decoder projs to LinearProj layout (proj.* keys)
        self.decoder.projs = nn.ModuleList(
            [LinearProj(hid, embed_dim) for _ in seg_layers])
        # reference wraps fuse/head differently: fuse = Sequential(conv)
        self.decoder.fuse = nn.Sequential(self.decoder.fuse)

    def forward(self, px):
        out = self.encoder(pixel_values=px, output_hidden_states=True,
                           interpolate_pos_encoding=True)
        cls_logit = self.cls_head(out.pooler_output)
        hs = out.hidden_states
        last = len(hs) - 1
        idxs = [(i + 1 if i >= 0 else last) for i in self.seg_layers]
        feats = [hs[i] for i in idxs]
        n = feats[0].shape[1]
        g = int(math.isqrt(n))
        # run the (re-wrapped) decoder manually
        d = self.decoder
        outs = []
        for proj, smooth, t in zip(d.projs, d.smooth, feats):
            x = proj(t).transpose(1, 2).reshape(t.shape[0], -1, g, g)
            outs.append(smooth(x))
        x = torch.cat(outs, dim=1)
        x = d.fuse_attn(x) * x
        x = d.fuse(x)
        x = TF.interpolate(x, size=(px.shape[-1], px.shape[-1]),
                           mode="bilinear", align_corners=False)
        return cls_logit, d.head(x)[:, 0]


def test_mtl_checkpoint_conversion_parity():
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16)
    torch.manual_seed(0)
    m = TorchMTL(hf_cfg).eval()

    cfg = MTLConfig(backbone=config_from_hf(hf_cfg), seg_layers=(0, -1),
                    embed_dim=16)
    params = from_reference_mtl_state_dict(m.state_dict(), cfg)

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        cls_ref, seg_ref = m(torch.from_numpy(px.transpose(0, 3, 1, 2)))
    cls_got, seg_got = mtl_forward(params, jnp.asarray(px), cfg, F32_POLICY)
    np.testing.assert_allclose(np.asarray(cls_got), cls_ref.numpy(),
                               atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(seg_got), seg_ref.numpy(),
                               atol=5e-4, rtol=5e-4)
