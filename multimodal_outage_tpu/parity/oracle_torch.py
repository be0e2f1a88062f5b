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


def conv1d_time_cl(x, kernel, bias, dilation=1):
    """Dilated temporal conv over [B, N, T, C] channels-last (the flax
    nn.Conv kernel_size>1 path in models/gwnet.py): flax kernel
    [k, in, out] → torch conv1d weight [out, in, k], VALID padding."""
    b, n, t, c = x.shape
    xc = x.reshape(b * n, t, c).permute(0, 2, 1)
    wt = kernel.permute(2, 1, 0)
    y = F.conv1d(xc, wt, bias, dilation=dilation)
    return y.permute(0, 2, 1).reshape(b, n, -1, kernel.shape[2])


class TorchOracle:
    """Eval-mode forward of the full fusion model from flax weights.

    view_quirk reproduces the reference's raw .view() memory reinterpret
    at the gwnet boundary (reference models/graph_wavenet.py:189,255).
    st_gnn selects the forecasting head: 'gwnet' (kernel_size 1 fused-path
    param naming, or >1 dilated-conv module naming) or 'dcrnn' (dual
    random-walk DCGRU seq2seq, reference models/unet.py:16-27)."""

    def __init__(
        self,
        fp: FlaxParams,
        depth: int = 4,
        order: int = 2,
        view_quirk: bool = False,
        st_gnn: str = "gwnet",
        kernel_size: int = 1,
        blocks: int = 4,
        layers: int = 2,
        max_diffusion_step: int = 2,
        num_rnn_layers: int = 2,
        horizon: int = 7,
        output_dim: int = 256,
    ):
        self.fp = fp
        self.depth = depth
        self.order = order
        self.view_quirk = view_quirk
        self.st_gnn = st_gnn
        self.kernel_size = kernel_size
        self.blocks = blocks
        self.layers = layers
        self.max_diffusion_step = max_diffusion_step
        self.num_rnn_layers = num_rnn_layers
        self.horizon = horizon
        self.output_dim = output_dim

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

    @property
    def receptive_field(self):
        rf = 1
        for _ in range(self.blocks):
            scope = self.kernel_size - 1
            for _ in range(self.layers):
                rf += scope
                scope *= 2
        return rf

    def _diffusion_terms(self, g, sups):
        terms = [g]
        for a in sups:
            t1 = torch.einsum("bvtc,vw->bwtc", g, a)
            terms.append(t1)
            for _ in range(2, self.order + 1):
                t1 = torch.einsum("bvtc,vw->bwtc", t1, a)
                terms.append(t1)
        return torch.cat(terms, dim=-1)

    def gwnet(self, x, supports):
        fp = self.fp
        sc = "st_gnn"
        blocks, layers = self.blocks, self.layers
        if self.view_quirk:
            b, n, t, c = x.shape
            # torch: input.view(1, C, N, T) on [N, T, C] contiguous memory
            x = x.reshape(b, c, n, t).permute(0, 2, 3, 1).contiguous()
        rf = self.receptive_field
        if rf > 1:
            # causal left-pad over T so output length == input length
            # (models/gwnet.py pads before start_conv)
            x = F.pad(x.permute(0, 3, 1, 2), (rf - 1, 0)).permute(0, 2, 3, 1)
        x = dense(x, fp.p(f"{sc}/start_conv/kernel"), fp.p(f"{sc}/start_conv/bias"))
        nv1 = fp.p(f"{sc}/nodevec1")
        nv2 = fp.p(f"{sc}/nodevec2")
        adp = torch.softmax(F.relu(nv1 @ nv2), dim=1)
        sups = [supports[i] for i in range(supports.shape[0])] + [adp]

        skip = None
        dilation = 1
        for i in range(blocks * layers):
            if i % layers == 0:
                dilation = 1
            residual = x
            if self.kernel_size == 1:
                # fused-path explicit params (models/gwnet.py:_fused_layer)
                filt = torch.tanh(
                    dense(x, fp.p(f"{sc}/filter_conv{i}_kernel"), fp.p(f"{sc}/filter_conv{i}_bias"))
                )
                gate = torch.sigmoid(
                    dense(x, fp.p(f"{sc}/gate_conv{i}_kernel"), fp.p(f"{sc}/gate_conv{i}_bias"))
                )
                g = filt * gate
                s = dense(g, fp.p(f"{sc}/skip_conv{i}_kernel"), fp.p(f"{sc}/skip_conv{i}_bias"))
                t_cur = s.shape[2]
                skip = s if skip is None else s + skip[:, :, -t_cur:, :]
                h = dense(
                    self._diffusion_terms(g, sups),
                    fp.p(f"{sc}/gconv{i}_kernel"),
                    fp.p(f"{sc}/gconv{i}_bias"),
                )
            else:
                # dilated temporal conv module naming (nn.Conv / DiffusionGCN)
                filt = torch.tanh(
                    conv1d_time_cl(
                        x, fp.p(f"{sc}/filter_conv{i}/kernel"),
                        fp.p(f"{sc}/filter_conv{i}/bias"), dilation,
                    )
                )
                gate = torch.sigmoid(
                    conv1d_time_cl(
                        x, fp.p(f"{sc}/gate_conv{i}/kernel"),
                        fp.p(f"{sc}/gate_conv{i}/bias"), dilation,
                    )
                )
                g = filt * gate
                s = dense(
                    g, fp.p(f"{sc}/skip_conv{i}/kernel"),
                    fp.p(f"{sc}/skip_conv{i}/bias"),
                )
                t_cur = s.shape[2]
                skip = s if skip is None else s + skip[:, :, -t_cur:, :]
                h = dense(
                    self._diffusion_terms(g, sups),
                    fp.p(f"{sc}/gconv{i}/mlp/kernel"),
                    fp.p(f"{sc}/gconv{i}/mlp/bias"),
                )
            dilation *= 2
            x = h + residual[:, :, -h.shape[2] :, :]
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

    # --- DCRNN (dual-random-walk DCGRU seq2seq, models/dcrnn.py) ----------
    def _diff_conv(self, x, supports, scope):
        """DiffusionConv: Chebyshev-style recursion then Dense proj.
        x: [B, N, D]; supports: list of [N, N]."""
        terms = [x]
        for a in supports:
            x1 = torch.einsum("vw,bvd->bwd", a, x)
            terms.append(x1)
            x0 = x
            for _ in range(2, self.max_diffusion_step + 1):
                x2 = 2.0 * torch.einsum("vw,bvd->bwd", a, x1) - x0
                terms.append(x2)
                x0, x1 = x1, x2
        h = torch.cat(terms, dim=-1)
        return dense(
            h, self.fp.p(f"{scope}/proj/kernel"), self.fp.p(f"{scope}/proj/bias")
        )

    def _dcgru_cell(self, h, x, supports, scope):
        inp = torch.cat([x, h], dim=-1)
        ru = torch.sigmoid(self._diff_conv(inp, supports, f"{scope}/gates"))
        r, u = torch.chunk(ru, 2, dim=-1)
        c = torch.tanh(
            self._diff_conv(
                torch.cat([x, r * h], dim=-1), supports, f"{scope}/candidate"
            )
        )
        return u * h + (1.0 - u) * c

    def dcrnn(self, x, supports):
        """Eval-mode (self-feeding decoder) DCRNN forward.
        x: [B, N, T, D]; returns [B, N, horizon, output_dim]."""
        sc = "st_gnn"
        b, n, t, _ = x.shape
        sups = [supports[i] for i in range(supports.shape[0])]
        units = self.fp.p(f"{sc}/encoder/cell0/gates/proj/bias").shape[0] // 2
        states = [
            torch.zeros(b, n, units) for _ in range(self.num_rnn_layers)
        ]
        for step in range(t):
            inp = x[:, :, step]
            for layer in range(self.num_rnn_layers):
                states[layer] = self._dcgru_cell(
                    states[layer], inp, sups, f"{sc}/encoder/cell{layer}"
                )
                inp = states[layer]
        outputs = []
        prev = torch.zeros(b, n, self.output_dim)
        for _ in range(self.horizon):
            inp = prev
            for layer in range(self.num_rnn_layers):
                states[layer] = self._dcgru_cell(
                    states[layer], inp, sups, f"{sc}/decoder/cell{layer}"
                )
                inp = states[layer]
            prev = dense(
                inp,
                self.fp.p(f"{sc}/decoder/proj/kernel"),
                self.fp.p(f"{sc}/decoder/proj/bias"),
            )
            outputs.append(prev)
        return torch.stack(outputs, dim=2)

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
        if self.st_gnn == "dcrnn":
            z = self.dcrnn(z, supports)
        else:
            z = self.gwnet(z, supports)
        d = self.decoder(z, grid, bottleneck.shape[-1])
        y = self.expansion(d, skips)
        return y.numpy()
