"""Optimized inference engine (production serving path).

Compiles a trained checkpoint into a lean eval-mode forward:
  * BatchNorms are algebraically folded into per-channel scale/bias
    applied inside the conv epilogues (fold_batchnorm);
  * dropout is elided entirely (eval mode);
  * weights are committed to device once (no per-call H2D);
  * optional fused Pallas kernels for the DoubleConvs
    (ops/unet_pallas.py) and the Graph WaveNet layers
    (ops/gwnet_pallas.py) — both default off because honest A/Bs
    measure XLA faster at this model's sizes (BENCHMARKS.md).

Consumes the standard training variables pytree (params + batch_stats) —
the serving path and the flax training model share weights bit-for-bit,
and tests assert output equality against model.apply(train=False).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.models.gwnet import GraphWaveNet
from multimodal_outage_tpu.ops.unet_pallas import (
    fold_batchnorm,
    forward_reference as double_conv_reference,
    fused_double_conv,
)


def _folded_double_conv_args(p: Dict, bs: Dict):
    s1, b1 = fold_batchnorm(
        p["bn1"]["scale"], p["bn1"]["bias"], bs["bn1"]["mean"], bs["bn1"]["var"]
    )
    s2, b2 = fold_batchnorm(
        p["bn2"]["scale"], p["bn2"]["bias"], bs["bn2"]["mean"], bs["bn2"]["var"]
    )
    return (
        p["conv1"]["kernel"], s1, b1,
        p["conv2"]["kernel"], s2, b2,
    )


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


class ServingModel:
    """Jitted eval forward built from trained variables."""

    def __init__(
        self,
        cfg: ModelConfig,
        variables: Dict[str, Any],
        supports: Optional[jnp.ndarray],
        use_pallas: bool = False,
        interpret: bool = False,
        gwnet_pallas: Optional[bool] = None,
        horizon: int = 7,
        gwnet_stack: Optional[bool] = None,
        dcrnn_stack: Optional[bool] = None,
        compiler_options="auto",
        mesh=None,
    ):
        """Pallas kernel policy, set by measured A/Bs (BENCHMARKS.md):
        the whole-stack fused st-GNN kernels (ops/gwnet_stack_pallas.py,
        ops/dcrnn_stack_pallas.py) default ON on TPU — they beat the XLA
        modules on B=1 forecast latency by collapsing the op-latency-
        bound serial chains into one program each (gwnet 2.4×, dcrnn
        1.14× — the DCGRU recurrence has a measured ~0.73 ms device-
        compute floor, so the dcrnn kernel engages at B=1 only; batched
        requests keep the XLA scan, which wins from B=16). The per-layer
        kernels (use_pallas for DoubleConv, gwnet_pallas for single
        gwnet layers) default OFF — XLA ties or wins at this model's
        sizes; they stay available and tested.

        The engine is immutable after construction: folded/stacked
        kernel weights and the baked adaptive adjacency are derived from
        `variables` ONCE here. To serve new weights, build a new
        ServingModel — reassigning .params/.batch_stats on a live engine
        would desynchronize them from the baked stage weights.

        compiler_options: dict of XLA options for the BATCHED serving
        jit, None for compiler defaults, or "auto" (default) for the
        measured-best 64 MiB scoped-VMEM fusion budget on TPU — +11%
        B=16 serving throughput over the 16 MiB compiler default, flat
        plateau 64-112 MiB (tools/probe_serving_vmem.py receipt in
        BENCHMARKS.md). The knee is higher than the train step's 48 MiB
        because the eval forward keeps no backward-needed activations,
        so deeper fusions don't fight a liveness-constrained schedule.
        B=1 requests are routed to a compiler-defaults jit (_make_jits):
        the budget measured a reproducible ~3.3% B=1 latency loss.

        mesh: a jax.sharding.Mesh for SPMD batched serving — params land
        under the tensor-parallel layouts (parallel.sharding._TP_RULES)
        and requests shard B-over-data / T-over-time. The whole-stack
        Pallas kernels are single-device programs, so a mesh engine
        always takes the XLA module path; keep a mesh-less engine for
        the latency-critical B=1 kernel route. Request batch size must
        be divisible by the mesh data axis (pad — see
        parallel.sharding.pad_batch — or size requests accordingly)."""
        import jax as _jax

        from multimodal_outage_tpu.train.steps import (
            default_compiler_options,
        )

        if compiler_options == "auto":
            compiler_options = default_compiler_options(65536)
        self._compiler_options = compiler_options
        self.cfg = cfg
        self._horizon = horizon
        self.mesh = mesh
        if mesh is not None:
            if gwnet_stack or dcrnn_stack or use_pallas or gwnet_pallas \
                    or interpret:
                raise ValueError(
                    "Pallas kernel paths are single-device programs; build "
                    "the ServingModel without mesh= for the fused B=1 "
                    "route, or drop the kernel flags for SPMD serving"
                )
            gwnet_stack = dcrnn_stack = False
            gwnet_pallas = False
        # Commit weights to device once — checkpoint restores hand back
        # host numpy arrays, which would otherwise re-transfer per call.
        # With a mesh they land directly under the TP/replicated layouts.
        if mesh is not None:
            # global_put: multi-host serving restores the checkpoint on
            # every host, so each process contributes its addressable
            # shards (device_put cannot reshard across hosts)
            from multimodal_outage_tpu.parallel.sharding import (
                global_put,
                tree_shardings,
            )

            self.params = _jax.tree.map(
                global_put,
                variables["params"],
                tree_shardings(mesh, variables["params"]),
            )
            bs = variables.get("batch_stats", {})
            self.batch_stats = _jax.tree.map(
                global_put, bs, tree_shardings(mesh, bs)
            )
        else:
            self.params = _jax.device_put(variables["params"])
            self.batch_stats = _jax.device_put(
                variables.get("batch_stats", {})
            )
        if supports is None:
            self.supports = None
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from multimodal_outage_tpu.parallel.sharding import global_put

            self.supports = global_put(supports, NamedSharding(mesh, P()))
        else:
            self.supports = _jax.device_put(supports)
        self.use_pallas = use_pallas
        self.interpret = interpret
        if gwnet_pallas is None:
            gwnet_pallas = interpret  # interpret-mode tests exercise it
        self.gwnet_pallas = gwnet_pallas
        if cfg.st_gnn == "dcrnn":
            from multimodal_outage_tpu.models.dcrnn import DCRNN

            d = cfg.dcrnn
            self._st_gnn = DCRNN(
                output_dim=cfg.feature_vector_size,
                horizon=horizon,
                rnn_units=d.rnn_units,
                num_rnn_layers=d.num_rnn_layers,
                max_diffusion_step=d.max_diffusion_step,
                dtype=jnp.dtype(cfg.compute_dtype),
            )
            if dcrnn_stack is None:
                # auto: same policy as the gwnet stack kernel — the
                # seq2seq is op-latency-bound at serving batch sizes
                dcrnn_stack = (
                    jax.default_backend() == "tpu" or interpret
                ) and supports is not None
            if dcrnn_stack and supports is None:
                raise ValueError(
                    "dcrnn_stack=True requires a supports array: the fused "
                    "DCGRU kernel bakes the diffusion supports at engine "
                    "build (pass supports=, or leave dcrnn_stack unset for "
                    "the auto policy which falls back to the scan module)"
                )
            self.dcrnn_stack = dcrnn_stack
            self._stack_sp = None
            if dcrnn_stack:
                from multimodal_outage_tpu.ops.dcrnn_stack_pallas import (
                    dcrnn_stack_params,
                )

                self._stack_sp = _jax.device_put(
                    dcrnn_stack_params(
                        variables["params"]["st_gnn"],
                        num_rnn_layers=d.num_rnn_layers,
                        max_diffusion_step=d.max_diffusion_step,
                        n_supports=int(supports.shape[0]),
                        input_dim=cfg.st_gnn_in_dim,
                        output_dim=cfg.feature_vector_size,
                        rnn_units=d.rnn_units,
                    )
                )
            self._make_jits()
            return
        if cfg.st_gnn != "gwnet":
            raise NotImplementedError(
                f"ServingModel supports st_gnn in ('gwnet', 'dcrnn') (got "
                f"{cfg.st_gnn!r}); use evaluate/predict for other st-GNNs"
            )
        g = cfg.gwnet
        if gwnet_stack is None:
            # auto: on when the fused-path preconditions hold and we are
            # on TPU (or interpreting, so CPU tests exercise the kernel)
            gwnet_stack = (
                (jax.default_backend() == "tpu" or interpret)
                and g.kernel_size == 1
                and g.gcn_bool
                and (supports is not None or g.addaptadj)
                and not g.reference_view_quirk
            )
        if gwnet_stack and supports is None and not g.addaptadj:
            raise ValueError(
                "gwnet_stack=True requires diffusion supports: pass "
                "supports= or enable addaptadj (the fused kernel bakes "
                "the support set at engine build)"
            )
        self.gwnet_stack = gwnet_stack
        self._stack_sp = None
        self._stack_supports = None
        if gwnet_stack:
            from multimodal_outage_tpu.ops.gwnet_stack_pallas import (
                adaptive_supports,
                stack_params_from_module,
            )

            p_st = variables["params"]["st_gnn"]
            bs_st = variables["batch_stats"]["st_gnn"]
            # fold BN + stack weights + bake the adaptive adjacency ONCE
            # at engine build (it depends only on params)
            self._stack_sp = _jax.device_put(
                stack_params_from_module(
                    p_st, bs_st, n_layers=g.blocks * g.layers
                )
            )
            self._stack_supports = _jax.device_put(
                adaptive_supports(
                    supports,
                    p_st.get("nodevec1") if g.addaptadj else None,
                    p_st.get("nodevec2") if g.addaptadj else None,
                    dtype=jnp.dtype(cfg.compute_dtype),
                )
            )
        self._st_gnn = GraphWaveNet(
            out_dim=cfg.feature_vector_size,
            residual_channels=g.residual_channels,
            dilation_channels=g.dilation_channels,
            skip_channels=g.skip_channels,
            end_channels=g.end_channels,
            kernel_size=g.kernel_size,
            blocks=g.blocks,
            layers=g.layers,
            dropout=g.dropout,
            order=g.order,
            gcn_bool=g.gcn_bool,
            addaptadj=g.addaptadj,
            node_embed_dim=g.node_embed_dim,
            reference_view_quirk=g.reference_view_quirk,
            use_pallas=self.gwnet_pallas,
            pallas_interpret=interpret,
            dtype=jnp.dtype(cfg.compute_dtype),
        )
        self._make_jits()

    def _make_jits(self):
        """Two jits over the same _forward: batched requests get the
        measured-best scoped-VMEM budget; B=1 requests keep compiler
        defaults (the budget measured 1.11x at B=16 but a reproducible
        ~3.3% B=1 latency LOSS — the deeper fusions it buys pay off on
        big tensors and cost schedule slack on small ones). __call__
        routes by batch size, so each shape compiles exactly once under
        the jit that wins for it.

        Mesh engines build one SPMD jit instead: explicit in/out
        shardings (TP params, B-over-data / T-over-time requests)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from multimodal_outage_tpu.parallel.sharding import (
                batch_shardings,
                tree_shardings,
            )

            def fwd(params, batch_stats, x, date_feats, supports):
                return self._forward(
                    params, batch_stats, x, date_feats, supports, None, None
                )

            bsh = batch_shardings(
                self.mesh, {"x": None, "date_feats": None}
            )
            self._jitted = self._jitted_b1 = None
            self._jitted_mesh = jax.jit(
                fwd,
                in_shardings=(
                    tree_shardings(self.mesh, self.params),
                    tree_shardings(self.mesh, self.batch_stats),
                    bsh["x"],
                    bsh["date_feats"],
                    NamedSharding(self.mesh, P()),
                ),
                out_shardings=bsh["x"],
                compiler_options=self._compiler_options,
            )
            return
        self._jitted = jax.jit(
            self._forward, compiler_options=self._compiler_options
        )
        self._jitted_b1 = (
            jax.jit(self._forward) if self._compiler_options
            else self._jitted
        )

    # Above this spatial size the kernel's lane-padded [H·W, 128] matmul
    # operands overflow the 16 MB VMEM budget; XLA convs take over there.
    _PALLAS_MAX_SPATIAL = 64

    def _double_conv(self, x, p, bs):
        """x: [M, H, W, Cin] folded image batch."""
        args = _folded_double_conv_args(p, bs)
        if self.use_pallas and x.shape[1] <= self._PALLAS_MAX_SPATIAL:
            return fused_double_conv(x, *args, self.interpret)
        return double_conv_reference(x, *args)

    def _forward(
        self, params, batch_stats, x, date_feats, supports,
        stack_sp=None, stack_supports=None,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        b, n, t, hh, ww, c_in = x.shape
        m = b * n * t
        p, bs = params, batch_stats

        # --- contraction ---------------------------------------------------
        y = x.astype(dtype).reshape(m, hh, ww, c_in)
        cp, cbs = p["contraction"], bs["contraction"]
        y = self._double_conv(y, cp["inc"], cbs["inc"])
        skips = [y]
        for i in range(1, cfg.depth + 1):
            y = _max_pool_2x2(y)
            y = self._double_conv(
                y, cp[f"down{i}"]["conv"], cbs[f"down{i}"]["conv"]
            )
            if i < cfg.depth:
                skips.append(y)

        # --- bottleneck encoder + time embedding ---------------------------
        flat = y.reshape(b, n, t, -1)
        z = jax.nn.relu(_dense(flat, p["encoder"]["fc1"]))
        z = jax.nn.relu(_dense(z, p["encoder"]["fc2"]))

        # Date2Vec in f32: the raw year (~2022) quantizes to multiples of
        # 8 in bf16; only the O(1) embedding joins the bf16 stream
        # (mirrors models/fusion.py)
        d2v = p["date2vec"]
        df32 = date_feats.astype(jnp.float32)
        te = jnp.concatenate(
            [
                _dense(df32, d2v["fc1"]),
                jnp.sin(_dense(df32, d2v["fc2"])),
            ],
            axis=-1,
        ).astype(dtype)
        te = jnp.broadcast_to(te[:, None], (b, n, t, te.shape[-1]))
        z = jnp.concatenate([z, te], axis=-1)

        # --- st-GNN (eval mode) --------------------------------------------
        # The DCRNN stack kernel engages at B=1 only (a trace-time shape
        # branch — each batch size is its own jit trace): the measured
        # A/B (bench dcrnn_stack, BENCHMARKS.md r3) has the kernel
        # winning B=1 (2.28 vs 2.59 ms) but LOSING B=16 (2.52 vs
        # 2.29 ms) — batched, XLA's scan amortizes the per-step ops over
        # rows while the one-sample-per-program kernel cannot.
        if stack_sp is not None and cfg.st_gnn == "dcrnn" and b == 1:
            from multimodal_outage_tpu.ops.dcrnn_stack_pallas import (
                dcrnn_stack_forward,
            )

            d = cfg.dcrnn
            z = dcrnn_stack_forward(
                z.astype(dtype),
                supports,
                stack_sp,
                horizon=self._horizon,
                num_rnn_layers=d.num_rnn_layers,
                max_diffusion_step=d.max_diffusion_step,
                rnn_units=d.rnn_units,
                interpret=self.interpret,
            )
        elif stack_sp is not None and cfg.st_gnn == "gwnet":
            from multimodal_outage_tpu.ops.gwnet_stack_pallas import (
                gwnet_stack_forward,
            )

            z = gwnet_stack_forward(
                z.astype(dtype),
                stack_supports,
                stack_sp,
                order=self.cfg.gwnet.order,
                interpret=self.interpret,
            )
        else:
            st_vars = {"params": p["st_gnn"]}
            if "st_gnn" in bs:  # DCRNN has no BatchNorms
                st_vars["batch_stats"] = bs["st_gnn"]
            z = self._st_gnn.apply(
                st_vars, z.astype(dtype), supports, train=False
            )

        # --- bottleneck decoder --------------------------------------------
        d = jax.nn.relu(_dense(z, p["decoder"]["fc1"]))
        d = jax.nn.relu(_dense(d, p["decoder"]["fc2"]))
        grid = hh // (2**cfg.depth)
        gc = cfg.base_channels * (2**cfg.depth)
        y = d.reshape(m, grid, grid, gc).astype(dtype)

        # --- expansion -----------------------------------------------------
        ep, ebs = p["expansion"], bs["expansion"]
        for i in range(1, cfg.depth + 1):
            up = ep[f"up{i}"]["up"]
            y = jax.lax.conv_transpose(
                y,
                up["kernel"].astype(dtype),
                strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + up["bias"].astype(dtype)
            skip = skips[-i]
            # pad-to-match for non-power-of-two sizes, same as the
            # training model's Up block (models/layers.py)
            dh = skip.shape[-3] - y.shape[-3]
            dw = skip.shape[-2] - y.shape[-2]
            if dh or dw:
                y = jnp.pad(
                    y,
                    [(0, 0), (dh // 2, dh - dh // 2),
                     (dw // 2, dw - dw // 2), (0, 0)],
                )
            y = jnp.concatenate([skip, y], axis=-1)
            y = self._double_conv(
                y, ep[f"up{i}"]["conv"], ebs[f"up{i}"]["conv"]
            )
        oc = ep["outc"]["conv"]
        y = (
            jnp.einsum("mhwc,xycd->mhwd", y, oc["kernel"].astype(dtype))
            + oc["bias"].astype(dtype)
        )
        return y.reshape(b, n, t, hh, ww, -1).astype(jnp.float32)

    def __call__(self, x, date_feats):
        if self.mesh is not None:
            from multimodal_outage_tpu.core.mesh import DATA_AXIS

            dp = self.mesh.shape[DATA_AXIS]
            if x.shape[0] % dp:
                raise ValueError(
                    f"request batch {x.shape[0]} not divisible by the mesh "
                    f"data axis {dp} — pad the batch "
                    "(parallel.sharding.pad_batch) or use a mesh-less "
                    "engine for B=1 latency serving"
                )
            return self._jitted_mesh(
                self.params, self.batch_stats, x, date_feats, self.supports
            )
        # folded stack weights travel as jit ARGUMENTS, never closure
        # constants (embedded device constants degrade dispatch)
        jitted = self._jitted_b1 if x.shape[0] == 1 else self._jitted
        return jitted(
            self.params, self.batch_stats, x, date_feats, self.supports,
            getattr(self, "_stack_sp", None),
            getattr(self, "_stack_supports", None),
        )
