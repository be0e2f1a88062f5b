"""Import reference PyTorch/Lightning checkpoints into framework params.

Migration path for users of the reference repo: a Lightning checkpoint
produced by the reference trainer (reference lit.py:187-196, restored at
lit.py:82 / tlit.py:49) converts into this framework's checkpoint format,
loadable by `evaluate`, `serve`, and `train --resume` (fine-tuning).

Key-name contract (derived from the reference module attribute layout —
this is the reference checkpoint's serialization interface):
  * Lightning wraps the model as `self.model` (reference lit.py:23), so
    every state_dict key carries a `model.` prefix; bare Modified_UNET
    state_dicts (no prefix) are also accepted.
  * DoubleConv is an nn.Sequential `double_conv` = [conv, bn, relu,
    conv, bn, relu] (reference models/unet.py:43-49) → indices 0/1/3/4.
  * Down wraps [MaxPool2d, DoubleConv] as `maxpool_conv` (models/unet.py:59),
    Up holds `up` (ConvTranspose2d) + `conv` (DoubleConv) (models/unet.py:71-72),
    OutConv holds `conv` (models/unet.py:89).
  * Graph WaveNet uses ModuleLists filter_convs/gate_convs/residual_convs/
    skip_convs/bn/gconv plus start_conv, end_conv_1/2, nodevec1/2
    (reference models/graph_wavenet.py:110-134,150-182); gconv's 1×1 mlp
    nests as `gconv.{i}.mlp.mlp` (graph_wavenet.py:71-81). residual_convs
    are constructed unconditionally but unused on the gcn path
    (graph_wavenet.py:159,239-245), so they may be absent from our tree.
  * Date2Vec ships as a separate whole-module torch pickle
    (reference date2vec.py:4-10, utils.py:108-109) with Linears
    fc1/fc2/fc3/fc4/fc5 (date2vec.py:23-37); the fusion model only needs
    the encode pair fc1/fc2 (date2vec.py:49-52).

Layout transforms (torch → flax, channels-last):
  Conv2d OIHW → HWIO; Linear [out,in] → Dense kernel [in,out];
  1×1 Conv2d → Dense kernel [in,out]; 1×K temporal Conv2d → 1-D conv
  kernel [K,in,out]; ConvTranspose2d [in,out,kh,kw] → [kh,kw,in,out];
  BatchNorm weight/bias/running_mean/running_var → params scale/bias +
  batch_stats mean/var.

`export_state_dict` is the exact inverse (reverse migration / test
round-trip). Both directions are generated from one rule table built
off the template tree, so they cannot drift apart.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# transform kinds: fn(torch_array) -> ours, and its inverse
_FWD = {
    "direct": lambda w: w,
    "linear": lambda w: w.T,  # [out,in] -> [in,out]
    "conv": lambda w: w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
    "conv1x1": lambda w: w[:, :, 0, 0].T,  # [out,in,1,1] -> [in,out]
    "conv1xk": lambda w: w[:, :, 0, :].transpose(2, 1, 0),  # ->[K,in,out]
    # torch ConvTranspose2d [in,out,kh,kw] is a gradient-derived transposed
    # conv; flax nn.ConvTranspose (transpose_kernel=False, models/layers.py
    # Up) is a fractionally-strided *correlation* — same op only with the
    # kernel spatially flipped (the parity oracle applies the same flip,
    # oracle_torch.py conv_transpose2d_cl). Transpose alone would scramble
    # every Up upsampler spatially.
    "convT": lambda w: w.transpose(2, 3, 0, 1)[::-1, ::-1],
}
_INV = {
    "direct": lambda w: w,
    "linear": lambda w: w.T,
    "conv": lambda w: w.transpose(3, 2, 0, 1),
    "conv1x1": lambda w: w.T[:, :, None, None],
    "conv1xk": lambda w: w.transpose(2, 1, 0)[:, :, None, :],
    "convT": lambda w: w[::-1, ::-1].transpose(2, 3, 0, 1),
}


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k in tree:
        v = tree[k]
        path = f"{prefix}/{k}" if prefix else str(k)
        if hasattr(v, "items"):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _double_conv_rules(
    ours_prefix: str, torch_prefix: str, collection: str
) -> List[Tuple[str, str, str, str]]:
    """(collection, ours_path, torch_key, kind) rows for one DoubleConv."""
    rows = []
    if collection == "params":
        for n, seq in ((1, 0), (2, 3)):
            rows.append(
                ("params", f"{ours_prefix}/conv{n}/kernel",
                 f"{torch_prefix}.{seq}.weight", "conv")
            )
        for n, seq in ((1, 1), (2, 4)):
            rows.append(
                ("params", f"{ours_prefix}/bn{n}/scale",
                 f"{torch_prefix}.{seq}.weight", "direct")
            )
            rows.append(
                ("params", f"{ours_prefix}/bn{n}/bias",
                 f"{torch_prefix}.{seq}.bias", "direct")
            )
    else:
        for n, seq in ((1, 1), (2, 4)):
            rows.append(
                ("batch_stats", f"{ours_prefix}/bn{n}/mean",
                 f"{torch_prefix}.{seq}.running_mean", "direct")
            )
            rows.append(
                ("batch_stats", f"{ours_prefix}/bn{n}/var",
                 f"{torch_prefix}.{seq}.running_var", "direct")
            )
    return rows


def _torch_dc_prefix(block_path: str) -> Optional[str]:
    """Our DoubleConv block prefix → the torch Sequential prefix."""
    m = re.fullmatch(r"contraction/inc", block_path)
    if m:
        return "contraction.inc.double_conv"
    m = re.fullmatch(r"contraction/(down\d+)/conv", block_path)
    if m:
        return f"contraction.{m.group(1)}.maxpool_conv.1.double_conv"
    m = re.fullmatch(r"expansion/(up\d+)/conv", block_path)
    if m:
        return f"expansion.{m.group(1)}.conv.double_conv"
    return None


def build_rules(variables: Dict[str, Any]) -> List[Tuple[str, str, str, str]]:
    """Generate the (collection, ours_path, torch_key, kind) table from a
    template variables tree, covering every leaf except the date2vec
    subtree (which lives in a separate torch pickle — see module doc)."""
    st = variables.get("params", {}).get("st_gnn", {})
    if "encoder" in st or "decoder" in st:
        raise ValueError(
            "no reference mapping for a DCRNN st-GNN: the reference never "
            "shipped DCRNN source (models/unet.py:13 imports it, "
            ".gitignore:17 excludes it), so no reference DCRNN checkpoints "
            "exist to import — only gwnet fusion checkpoints convert"
        )
    rules: List[Tuple[str, str, str, str]] = []
    seen_blocks = set()
    for collection in ("params", "batch_stats"):
        flat = _flatten(variables.get(collection, {}))
        for path, leaf in flat.items():
            if path.startswith("date2vec/"):
                continue  # separate .pth; handled by date2vec_params_from_pth
            # U-Net DoubleConv blocks (conv1/conv2/bn1/bn2 leaves)
            m = re.fullmatch(r"(.*)/(conv[12]|bn[12])/[a-z]+", path)
            if m and _torch_dc_prefix(m.group(1)):
                key = (collection, m.group(1))
                if key not in seen_blocks:
                    seen_blocks.add(key)
                    rules.extend(
                        _double_conv_rules(
                            m.group(1), _torch_dc_prefix(m.group(1)), collection
                        )
                    )
                continue
            # transpose-conv upsamplers
            m = re.fullmatch(r"expansion/(up\d+)/up/(kernel|bias)", path)
            if m:
                kind = "convT" if m.group(2) == "kernel" else "direct"
                rules.append(
                    (collection, path,
                     f"expansion.{m.group(1)}.up.{_wb(m.group(2))}", kind)
                )
                continue
            # 1×1 output head
            m = re.fullmatch(r"expansion/outc/conv/(kernel|bias)", path)
            if m:
                kind = "conv" if m.group(1) == "kernel" else "direct"
                rules.append(
                    (collection, path,
                     f"expansion.outc.conv.{_wb(m.group(1))}", kind)
                )
                continue
            # bottleneck MLPs
            m = re.fullmatch(r"(encoder|decoder)/(fc[12])/(kernel|bias)", path)
            if m:
                kind = "linear" if m.group(3) == "kernel" else "direct"
                rules.append(
                    (collection, path,
                     f"{m.group(1)}.{m.group(2)}.{_wb(m.group(3))}", kind)
                )
                continue
            if path.startswith("st_gnn/"):
                rules.append(_gwnet_rule(collection, path, leaf))
                continue
            raise ValueError(
                f"no reference mapping for {collection}:{path} — the torch "
                "importer only covers the gwnet fusion model (the reference "
                "never shipped DCRNN source, models/unet.py:13 / .gitignore:17)"
            )
    return rules


def _wb(ours_leaf: str) -> str:
    return {"kernel": "weight", "bias": "bias"}[ours_leaf]


def _gwnet_rule(collection: str, path: str, leaf) -> Tuple[str, str, str, str]:
    sub = path[len("st_gnn/"):]
    # flat Dense-style per-layer params (kernel_size == 1 fast path)
    m = re.fullmatch(r"(filter|gate|skip)_conv(\d+)_(kernel|bias)", sub)
    if m:
        kind = "conv1x1" if m.group(3) == "kernel" else "direct"
        return (collection, path,
                f"st_gnn.{m.group(1)}_convs.{m.group(2)}.{_wb(m.group(3))}",
                kind)
    m = re.fullmatch(r"gconv(\d+)_(kernel|bias)", sub)
    if m:
        kind = "conv1x1" if m.group(2) == "kernel" else "direct"
        return (collection, path,
                f"st_gnn.gconv.{m.group(1)}.mlp.mlp.{_wb(m.group(2))}", kind)
    # named-module variants (kernel_size > 1 temporal convs, gcn off):
    # filter/gate become 1-D temporal convs; skip stays 1×1 (Dense)
    m = re.fullmatch(r"(filter|gate|skip)_conv(\d+)/(kernel|bias)", sub)
    if m:
        if m.group(3) != "kernel":
            kind = "direct"
        elif m.group(1) == "skip":
            kind = "conv1x1"
        else:
            kind = "conv1xk"
        return (collection, path,
                f"st_gnn.{m.group(1)}_convs.{m.group(2)}.{_wb(m.group(3))}",
                kind)
    m = re.fullmatch(r"residual_conv(\d+)/(kernel|bias)", sub)
    if m:
        kind = "conv1x1" if m.group(2) == "kernel" else "direct"
        return (collection, path,
                f"st_gnn.residual_convs.{m.group(1)}.{_wb(m.group(2))}", kind)
    m = re.fullmatch(r"(start_conv|end_conv_1|end_conv_2)/(kernel|bias)", sub)
    if m:
        kind = "conv1x1" if m.group(2) == "kernel" else "direct"
        return (collection, path,
                f"st_gnn.{m.group(1)}.{_wb(m.group(2))}", kind)
    m = re.fullmatch(r"bn(\d+)/(scale|bias|mean|var)", sub)
    if m:
        tk = {"scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[m.group(2)]
        return (collection, path, f"st_gnn.bn.{m.group(1)}.{tk}", "direct")
    if sub in ("nodevec1", "nodevec2"):
        return (collection, path, f"st_gnn.{sub}", "direct")
    raise ValueError(f"no reference mapping for gwnet param {path!r}")


def strip_lightning_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Accept both LitModified_UNET checkpoints (keys under `model.`,
    reference lit.py:23) and bare Modified_UNET state_dicts."""
    if any(k.startswith("model.") for k in sd):
        return {
            k[len("model."):]: v for k, v in sd.items()
            if k.startswith("model.")
        }
    return dict(sd)


def import_state_dict(
    sd: Dict[str, Any],
    variables: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Map a reference state_dict onto a template variables tree.

    Returns {"params", "batch_stats"} with every mappable leaf replaced
    by the (layout-transformed) reference weight, cast to the template
    leaf's dtype. The date2vec subtree keeps the template values (the
    reference stores time embeddings outside the model — feed
    `date2vec_params_from_pth` output through `merge_date2vec`).

    strict=True raises if any template leaf has no source key or any
    reference key goes unconsumed (ignoring num_batches_tracked counters
    and the structurally-dead residual_convs — see module doc)."""
    sd = {k: np.asarray(_to_np(v)) for k, v in strip_lightning_prefix(sd).items()}
    rules = build_rules(variables)
    flat = {c: _flatten(variables.get(c, {})) for c in ("params", "batch_stats")}
    out = {c: dict(f) for c, f in flat.items()}
    consumed = set()
    missing = []
    for collection, ours_path, torch_key, kind in rules:
        if torch_key not in sd:
            missing.append(f"{collection}:{ours_path} <- {torch_key}")
            continue
        w = _FWD[kind](sd[torch_key])
        tmpl = flat[collection][ours_path]
        if tuple(w.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                f"shape mismatch importing {torch_key} -> {ours_path}: "
                f"torch {tuple(sd[torch_key].shape)} maps to {tuple(w.shape)}, "
                f"template expects {tuple(np.shape(tmpl))} — check the model "
                "flags (st_gnn/horizon/channels) match the checkpoint's"
            )
        out[collection][ours_path] = w.astype(tmpl.dtype)
        consumed.add(torch_key)
    if strict and missing:
        raise ValueError(
            "reference checkpoint is missing keys for: " + ", ".join(missing)
        )
    leftovers = [
        k for k in sd
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and not k.startswith("st_gnn.residual_convs.")
    ]
    if strict and leftovers:
        raise ValueError(
            "unconsumed reference keys (wrong architecture flags?): "
            + ", ".join(sorted(leftovers)[:12])
        )
    return {c: _unflatten(f) for c, f in out.items()}


def export_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of import_state_dict: our variables → a reference-named,
    torch-layout numpy state_dict (load into the reference modules with
    strict=False — BN num_batches_tracked counters and the dead
    residual_convs are not emitted)."""
    rules = build_rules(variables)
    flat = {c: _flatten(variables.get(c, {})) for c in ("params", "batch_stats")}
    sd = {}
    for collection, ours_path, torch_key, kind in rules:
        # ascontiguousarray: the convT flip yields a negative-strided view,
        # which torch.from_numpy refuses
        sd[torch_key] = np.ascontiguousarray(
            _INV[kind](np.asarray(flat[collection][ours_path]))
        )
    return sd


def merge_date2vec(
    params: Dict[str, Any], d2v: Dict[str, Any]
) -> Dict[str, Any]:
    """Replace the date2vec/fc1,fc2 leaves (the encode pair the fusion
    forward uses, reference date2vec.py:49-52) with imported weights."""
    flat = _flatten(params)
    for fc in ("fc1", "fc2"):
        for leaf in ("kernel", "bias"):
            path = f"date2vec/{fc}/{leaf}"
            if path not in flat:
                raise ValueError(f"template has no {path}")
            w = np.asarray(d2v[fc][leaf])
            if tuple(w.shape) != tuple(np.shape(flat[path])):
                raise ValueError(
                    f"date2vec shape mismatch at {path}: pth gives "
                    f"{tuple(w.shape)}, template expects "
                    f"{tuple(np.shape(flat[path]))} (k must match "
                    "time_embed_size; the shipped reference checkpoint "
                    "was k=64, SURVEY C3)"
                )
            flat[path] = w.astype(flat[path].dtype)
    return _unflatten(flat)


def date2vec_params_from_pth(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load a reference Date2Vec checkpoint (*.pth).

    Accepts either a plain state_dict or the reference's whole-module
    pickle (reference date2vec.py:6 `torch.load(model_path)`). Module
    pickles reference the class by import path; a minimal shim class with
    the reference's attribute layout (fc1/fc2/d2/fc3/d3/fc4/fc5,
    date2vec.py:23-37) is registered under the module names the reference
    used, so unpickling succeeds without the reference on sys.path."""
    import torch

    _register_date2vec_shim()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj if isinstance(obj, dict) else obj.state_dict()
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for fc in ("fc1", "fc2"):
        out[fc] = {
            "kernel": sd[f"{fc}.weight"].T,
            "bias": sd[f"{fc}.bias"],
        }
    return out


def _register_date2vec_shim() -> None:
    import sys
    import types

    import torch
    from torch import nn

    class Date2Vec(nn.Module):  # attribute layout per reference date2vec.py
        def __init__(self, k=32, act="sin"):
            super().__init__()
            k1 = k // 2
            k2 = k - k1
            self.fc1 = nn.Linear(6, k1)
            self.fc2 = nn.Linear(6, k2)
            self.d2 = nn.Dropout(0.3)
            self.activation = torch.sin if act == "sin" else torch.cos
            self.fc3 = nn.Linear(k, k // 2)
            self.d3 = nn.Dropout(0.3)
            self.fc4 = nn.Linear(k // 2, 6)
            self.fc5 = nn.Linear(6, 6)

    # make the shim itself picklable (tests round-trip through torch.save);
    # loading only needs the names to resolve, saving needs them to match
    Date2Vec.__module__ = "date2vec"
    Date2Vec.__qualname__ = "Date2Vec"

    for mod_name in ("date2vec", "Model", "model"):
        mod = sys.modules.get(mod_name)
        if mod is None:
            mod = types.ModuleType(mod_name)
            sys.modules[mod_name] = mod
        if not hasattr(mod, "Date2Vec"):
            mod.Date2Vec = Date2Vec


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference checkpoint file (.ckpt Lightning dict with
    a 'state_dict' entry, or a bare state_dict .pth) → numpy dict.

    Tries weights_only=True first (no arbitrary-code-execution surface);
    falls back to a full unpickle ONLY on torch's weights-only POLICY
    rejection (pickle.UnpicklingError whose message names an
    "Unsupported global" — a valid pickle referencing module classes,
    which genuinely needs the full loader; that path trusts the
    checkpoint file). Anything else — I/O errors, corrupt archives
    ("invalid load key"), torch version quirks — propagates instead of
    silently re-opening the arbitrary-code-execution unpickle path
    (advisor r4)."""
    import pickle

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError as e:
        if "Unsupported global" not in str(e):
            raise
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        obj = obj.state_dict()
    return {k: _to_np(v) for k, v in obj.items()}


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def convert_checkpoint(
    cfg,
    checkpoint_path: str,
    out_dir: str,
    d2v_pth: Optional[str] = None,
    strict: bool = True,
) -> Dict[str, int]:
    """Reference .ckpt/.pth → a framework checkpoint directory.

    The written checkpoint carries the full training tree (params +
    batch_stats + fresh optimizer state + step 0 + early-stop meta), so
    it works with `evaluate`, `serve`, AND `train --resume` (fine-tune a
    reference-trained model). No data store is needed — the template is
    built on a zeros batch of the configured shapes."""
    import jax
    import jax.numpy as jnp

    from multimodal_outage_tpu.core.checkpoint import CheckpointManager
    from multimodal_outage_tpu.train.loop import build_model, build_supports
    from multimodal_outage_tpu.train.state import create_train_state

    n, t = cfg.data.n_counties, cfg.data.horizon
    s, c = cfg.data.image_size, cfg.model.input_channels
    # host-side tool: build the template on CPU — a full-scale model.init
    # on the TPU backend costs a multi-minute compile for a conversion
    # that never needs the accelerator (evaluate/serve restore onto the
    # TPU later)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sample = {
            "x": jnp.zeros(
                (1, n, t, s, s, c), jnp.dtype(cfg.model.compute_dtype)
            ),
            "date_feats": jnp.zeros((1, t, 6), jnp.float32),
        }
        model = build_model(cfg.model, t)
        supports = build_supports(cfg, n)
        state = create_train_state(
            model, jax.random.PRNGKey(cfg.train.seed), sample, supports,
            d2v_bundle=cfg.model.d2v_bundle,
        )
    sd = load_torch_checkpoint(checkpoint_path)
    imported = import_state_dict(
        sd,
        {"params": state.params, "batch_stats": state.batch_stats},
        strict=strict,
    )
    params = imported["params"]
    if d2v_pth:
        params = merge_date2vec(params, date2vec_params_from_pth(d2v_pth))
    ckpt = CheckpointManager(out_dir)
    ckpt.save(
        0,
        {
            "params": params,
            "batch_stats": imported["batch_stats"],
            "opt_state": state.opt_state,
            "step": jnp.zeros((), jnp.int32),
            "meta": {
                "epoch": jnp.int32(0),
                "best_val": jnp.float32(jnp.inf),
                "best_epoch": jnp.int32(-1),
                "bad_epochs": jnp.int32(0),
            },
        },
        # finite sentinel: orbax's best-metric JSON can't hold inf, and any
        # real validation sweep will beat it, so resume-training demotes
        # the imported snapshot as soon as an epoch completes
        metrics={"val_loss": 1e30},
    )
    ckpt.close()
    n_imported = sum(
        1 for _ in jax.tree.leaves(imported["params"])
    ) + sum(1 for _ in jax.tree.leaves(imported["batch_stats"]))
    return {"leaves": n_imported, "torch_keys": len(sd)}
