"""Torch-oracle parity for the SegFormer-style decoder: a torch module built
to the reference architecture (siglip2siddataset.py:698-745) with weights
shared into the tpudf decoder must produce identical segmentation logits."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as TF

import jax.numpy as jnp

from tpudf.models.segformer import MTLConfig, apply_segformer_decoder
from tpudf.models.siglip import SigLIPConfig


class TorchDecoder(nn.Module):
    def __init__(self, in_dims, embed_dim):
        super().__init__()
        k = len(in_dims)
        self.projs = nn.ModuleList([nn.Linear(d, embed_dim)
                                    for d in in_dims])
        self.smooth = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(embed_dim, embed_dim, 3, padding=1,
                          groups=embed_dim),
                nn.Conv2d(embed_dim, embed_dim, 1), nn.GELU())
            for _ in in_dims])
        self.fuse_attn = nn.Sequential(
            nn.Conv2d(embed_dim * k, embed_dim * k // 4, 1), nn.GELU(),
            nn.Conv2d(embed_dim * k // 4, embed_dim * k, 1), nn.Sigmoid())
        self.fuse = nn.Conv2d(embed_dim * k, embed_dim, 1)
        self.head = nn.Conv2d(embed_dim, 1, 1)

    def forward(self, hidden_list, grid_hw, target):
        h, w = grid_hw
        feats = []
        for proj, smooth, t in zip(self.projs, self.smooth, hidden_list):
            x = proj(t).transpose(1, 2)
            b, e, n = x.shape
            x = x.reshape(b, e, h, w)
            feats.append(smooth(x))
        x = torch.cat(feats, dim=1)
        x = self.fuse_attn(x) * x
        x = self.fuse(x)
        x = TF.interpolate(x, size=(target, target), mode="bilinear",
                           align_corners=False)
        return self.head(x)


def _conv_params(conv):
    # torch OIHW → tpudf HWIO
    return {"w": jnp.asarray(conv.weight.detach().numpy()
                             .transpose(2, 3, 1, 0)),
            "b": jnp.asarray(conv.bias.detach().numpy())}


def test_decoder_torch_parity():
    torch.manual_seed(0)
    embed, width, k, grid = 16, 32, 2, 4
    m = TorchDecoder([width] * k, embed).eval()

    params = {
        "projs": [{"w": jnp.asarray(p.weight.detach().numpy().T),
                   "b": jnp.asarray(p.bias.detach().numpy())}
                  for p in m.projs],
        "smooth": [{"dw": _conv_params(s[0]), "pw": _conv_params(s[1])}
                   for s in m.smooth],
        "attn1": _conv_params(m.fuse_attn[0]),
        "attn2": _conv_params(m.fuse_attn[2]),
        "fuse": _conv_params(m.fuse),
        "head": _conv_params(m.head),
    }

    rng = np.random.default_rng(0)
    hidden = [rng.standard_normal((2, grid * grid, width)).astype(np.float32)
              for _ in range(k)]
    with torch.no_grad():
        ref = m([torch.from_numpy(h) for h in hidden], (grid, grid),
                32).numpy()[:, 0]
    got = np.asarray(apply_segformer_decoder(
        params, [jnp.asarray(h) for h in hidden], (grid, grid), 32))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)
