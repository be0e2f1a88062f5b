"""PyTorch numerical-parity oracle.

BASELINE.json requires the TPU framework's forecasts to match a PyTorch
implementation of the same architecture to ≤1e-5 (eval mode, shared
weights). The reference snapshot itself is not runnable (missing DCRNN
source and Date2Vec checkpoint — SURVEY §8.1-2), so this oracle is
re-derived from the architecture documented in SURVEY §2/§3.3 and serves
as the independent torch implementation for the parity harness.

Implementation style: tensors stay channels-LAST (matching the JAX
framework's layout) and are permuted only around the torch conv calls, so
flatten/reshape orderings are trivially identical between frameworks and
weight transfer is mechanical:
    flax Dense kernel [in, out]          → torch Linear weight.T
    flax Conv kernel [kh, kw, in, out]   → torch Conv2d weight (3,2,0,1)
    flax ConvTranspose kernel            → torch ConvTranspose2d (2,3,0,1)

Eval mode only: BatchNorm uses running statistics; dropout is off —
exactly the regime the ≤1e-5 target is practical in (SURVEY §4.5).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.array(x, dtype=np.float32))


class FlaxParams:
    """Dot-path accessor over nested flax params/batch_stats dicts."""

    def __init__(self, params: Dict, batch_stats: Dict):
        self.params = params
        self.batch_stats = batch_stats

    def p(self, path: str) -> torch.Tensor:
        node = self.params
        for key in path.split("/"):
            node = node[key]
        return _t(node)

    def bs(self, path: str) -> torch.Tensor:
        node = self.batch_stats
        for key in path.split("/"):
            node = node[key]
        return _t(node)


def conv2d_cl(x, kernel, bias=None, padding=0):
    """Conv over channels-last [..., H, W, C] via torch channels-first."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xc = x.reshape(-1, h, w, c).permute(0, 3, 1, 2)
    wt = kernel.permute(3, 2, 0, 1)  # [kh,kw,in,out] → [out,in,kh,kw]
    y = F.conv2d(xc, wt, bias, padding=padding)
    return y.permute(0, 2, 3, 1).reshape(*lead, *y.shape[2:], y.shape[1])


def conv_transpose2d_cl(x, kernel, bias=None, stride=2):
    """Transposed conv (k=2, s=2) over channels-last, matching flax
    ConvTranspose(padding='VALID'): a fractionally-strided *correlation*,
    i.e. torch conv_transpose with the spatially flipped kernel."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xc = x.reshape(-1, h, w, c).permute(0, 3, 1, 2)
    wt = kernel.flip(0, 1).permute(2, 3, 0, 1)  # → [in,out,kh,kw], flipped
    y = F.conv_transpose2d(xc, wt, bias, stride=stride)
    return y.permute(0, 2, 3, 1).reshape(*lead, *y.shape[2:], y.shape[1])


def batchnorm_eval_cl(x, scale, bias, mean, var, eps=1e-5):
    inv = scale / torch.sqrt(var + eps)
    return (x - mean) * inv + bias


def dense(x, kernel, bias):
    return x @ kernel + bias


class TorchOracle:
    """Eval-mode forward of the full fusion model from flax weights.

    view_quirk reproduces the reference's raw .view() memory reinterpret
    at the gwnet boundary (reference models/graph_wavenet.py:189,255)."""

    def __init__(
        self,
        fp: FlaxParams,
        depth: int = 4,
        order: int = 2,
        view_quirk: bool = False,
    ):
        self.fp = fp
        self.depth = depth
        self.order = order
        self.view_quirk = view_quirk

    # --- blocks -----------------------------------------------------------
    def double_conv(self, x, scope):
        fp = self.fp
        for i in (1, 2):
            x = conv2d_cl(x, fp.p(f"{scope}/conv{i}/kernel"), padding=1)
            x = batchnorm_eval_cl(
                x,
                fp.p(f"{scope}/bn{i}/scale"),
                fp.p(f"{scope}/bn{i}/bias"),
                fp.bs(f"{scope}/bn{i}/mean"),
                fp.bs(f"{scope}/bn{i}/var"),
            )
            x = F.relu(x)
        return x

    def max_pool(self, x):
        lead = x.shape[:-3]
        h, w, c = x.shape[-3:]
        xc = x.reshape(-1, h, w, c).permute(0, 3, 1, 2)
        y = F.max_pool2d(xc, 2)
        return y.permute(0, 2, 3, 1).reshape(*lead, h // 2, w // 2, c)

    def contraction(self, x):
        x = self.double_conv(x, "contraction/inc")
        skips = [x]
        for i in range(1, self.depth + 1):
            x = self.double_conv(
                self.max_pool(x), f"contraction/down{i}/conv"
            )
            if i < self.depth:
                skips.append(x)
        return x, skips

    def encoder(self, x):
        fp = self.fp
        flat = x.reshape(*x.shape[:-3], -1)
        h = F.relu(dense(flat, fp.p("encoder/fc1/kernel"), fp.p("encoder/fc1/bias")))
        return F.relu(dense(h, fp.p("encoder/fc2/kernel"), fp.p("encoder/fc2/bias")))

    def date2vec(self, feats):
        fp = self.fp
        out1 = dense(feats, fp.p("date2vec/fc1/kernel"), fp.p("date2vec/fc1/bias"))
        out2 = torch.sin(
            dense(feats, fp.p("date2vec/fc2/kernel"), fp.p("date2vec/fc2/bias"))
        )
        return torch.cat([out1, out2], dim=-1)

    def gwnet(self, x, supports, blocks=4, layers=2):
        fp = self.fp
        sc = "st_gnn"
        if self.view_quirk:
            b, n, t, c = x.shape
            # torch: input.view(1, C, N, T) on [N, T, C] contiguous memory
            x = x.reshape(b, c, n, t).permute(0, 2, 3, 1).contiguous()
        x = dense(x, fp.p(f"{sc}/start_conv/kernel"), fp.p(f"{sc}/start_conv/bias"))
        nv1 = fp.p(f"{sc}/nodevec1")
        nv2 = fp.p(f"{sc}/nodevec2")
        adp = torch.softmax(F.relu(nv1 @ nv2), dim=1)
        sups = [supports[i] for i in range(supports.shape[0])] + [adp]

        skip = None
        for i in range(blocks * layers):
            residual = x
            filt = torch.tanh(
                dense(x, fp.p(f"{sc}/filter_conv{i}_kernel"), fp.p(f"{sc}/filter_conv{i}_bias"))
            )
            gate = torch.sigmoid(
                dense(x, fp.p(f"{sc}/gate_conv{i}_kernel"), fp.p(f"{sc}/gate_conv{i}_bias"))
            )
            g = filt * gate
            s = dense(g, fp.p(f"{sc}/skip_conv{i}_kernel"), fp.p(f"{sc}/skip_conv{i}_bias"))
            skip = s if skip is None else s + skip

            terms = [g]
            for a in sups:
                t1 = torch.einsum("bvtc,vw->bwtc", g, a)
                terms.append(t1)
                for _ in range(2, self.order + 1):
                    t1 = torch.einsum("bvtc,vw->bwtc", t1, a)
                    terms.append(t1)
            h = dense(
                torch.cat(terms, dim=-1),
                fp.p(f"{sc}/gconv{i}_kernel"),
                fp.p(f"{sc}/gconv{i}_bias"),
            )
            x = h + residual
            x = batchnorm_eval_cl(
                x,
                fp.p(f"{sc}/bn{i}/scale"),
                fp.p(f"{sc}/bn{i}/bias"),
                fp.bs(f"{sc}/bn{i}/mean"),
                fp.bs(f"{sc}/bn{i}/var"),
            )

        out = F.relu(skip)
        out = F.relu(
            dense(out, fp.p(f"{sc}/end_conv_1/kernel"), fp.p(f"{sc}/end_conv_1/bias"))
        )
        out = dense(out, fp.p(f"{sc}/end_conv_2/kernel"), fp.p(f"{sc}/end_conv_2/bias"))
        if self.view_quirk:
            bo, no, to, co = out.shape
            # torch: x.view(N, T, C) on [1, C, N, T] contiguous memory
            out = (
                out.permute(0, 3, 1, 2).contiguous().reshape(bo, no, to, co)
            )
        return out

    def decoder(self, x, grid, grid_ch):
        fp = self.fp
        h = F.relu(dense(x, fp.p("decoder/fc1/kernel"), fp.p("decoder/fc1/bias")))
        h = F.relu(dense(h, fp.p("decoder/fc2/kernel"), fp.p("decoder/fc2/bias")))
        return h.reshape(*h.shape[:-1], grid, grid, grid_ch)

    def expansion(self, x, skips):
        fp = self.fp
        for i in range(1, self.depth + 1):
            scope = f"expansion/up{i}"
            up = conv_transpose2d_cl(
                x, fp.p(f"{scope}/up/kernel"), fp.p(f"{scope}/up/bias")
            )
            skip = skips[-i]
            x = torch.cat([skip, up], dim=-1)
            x = self.double_conv(x, f"{scope}/conv")
        return conv2d_cl(
            x, fp.p("expansion/outc/conv/kernel"), fp.p("expansion/outc/conv/bias")
        )

    # --- full model -------------------------------------------------------
    @torch.no_grad()
    def forward(self, x, date_feats, supports):
        """x: [B,N,T,H,W,C]; date_feats: [B,T,6]; supports: [S,N,N]."""
        x = _t(x)
        date_feats = _t(date_feats)
        supports = _t(supports)
        b, n, t = x.shape[:3]
        grid = x.shape[3] // (2**self.depth)

        bottleneck, skips = self.contraction(x)
        z = self.encoder(bottleneck)
        te = self.date2vec(date_feats)  # [B, T, 64]
        te = te[:, None].expand(b, n, t, te.shape[-1])
        z = torch.cat([z, te], dim=-1)
        z = self.gwnet(z, supports)
        d = self.decoder(z, grid, bottleneck.shape[-1])
        y = self.expansion(d, skips)
        return y.numpy()
