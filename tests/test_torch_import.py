"""Reference-checkpoint importer (parity/torch_import.py).

The import↔export pair is generated from one rule table, so a bitwise
round-trip plus strict-mode key accounting pins the whole mapping:
every framework leaf has exactly one reference key, every transform has
an exact inverse, and Lightning's `model.` prefix / BN counters / dead
residual_convs (reference graph_wavenet.py:159,239-245) are handled.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import (
    DCRNNConfig,
    GWNetConfig,
    ModelConfig,
)
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.parity.torch_import import (
    convert_checkpoint,
    date2vec_params_from_pth,
    export_state_dict,
    import_state_dict,
    merge_date2vec,
)

N, T, H = 5, 3, 32
KEY = jax.random.PRNGKey(7)


def _variables(cfg=None):
    cfg = cfg or ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (1, N, T, H, H, cfg.input_channels))
    feats = jnp.tile(jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (1, T, 1))
    sup = jnp.eye(N)[None]
    v = model.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    # randomize batch_stats so mean/var mapping is distinguishable from 0/1
    bs = jax.tree.map(
        lambda l: jax.random.uniform(KEY, l.shape, minval=0.5, maxval=1.5
                                     ).astype(l.dtype),
        v["batch_stats"],
    )
    return {"params": v["params"], "batch_stats": bs}


def _leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_export_import_round_trip_bitwise():
    variables = _variables()
    sd = export_state_dict(variables)
    # every exported tensor is torch-layout: conv weights are OIHW
    w = sd["contraction.inc.double_conv.0.weight"]
    assert w.shape == (4, 1, 3, 3)
    assert sd["encoder.fc1.weight"].shape[0] < sd["encoder.fc1.weight"].shape[1]
    assert sd["st_gnn.start_conv.weight"].shape == (32, 320, 1, 1)
    assert sd["st_gnn.gconv.0.mlp.mlp.weight"].shape[1] == 160
    assert sd["expansion.up1.up.weight"].shape == (64, 32, 2, 2)
    out = import_state_dict(sd, variables, strict=True)
    _leaves_equal(out, variables)


def test_lightning_prefix_counters_and_dead_residual_convs():
    variables = _variables()
    sd = {f"model.{k}": v for k, v in export_state_dict(variables).items()}
    # artifacts every real reference checkpoint carries
    sd["model.contraction.inc.double_conv.1.num_batches_tracked"] = np.zeros(
        (), np.int64
    )
    sd["model.st_gnn.residual_convs.0.weight"] = np.zeros(
        (32, 32, 1, 1), np.float32
    )
    sd["model.st_gnn.residual_convs.0.bias"] = np.zeros((32,), np.float32)
    out = import_state_dict(sd, variables, strict=True)
    _leaves_equal(out, variables)


def test_strict_mode_catches_missing_and_extra_keys():
    variables = _variables()
    sd = export_state_dict(variables)
    missing = dict(sd)
    del missing["encoder.fc1.weight"]
    with pytest.raises(ValueError, match="missing keys.*encoder.fc1"):
        import_state_dict(missing, variables, strict=True)
    extra = dict(sd)
    extra["st_gnn.mystery.weight"] = np.zeros((3,), np.float32)
    with pytest.raises(ValueError, match="unconsumed.*mystery"):
        import_state_dict(extra, variables, strict=True)
    # non-strict tolerates both
    out = import_state_dict(extra, variables, strict=False)
    _leaves_equal(out, variables)


def test_shape_mismatch_is_diagnosed():
    variables = _variables()
    sd = export_state_dict(variables)
    sd["decoder.fc1.weight"] = np.zeros((7, 7), np.float32)
    with pytest.raises(ValueError, match="shape mismatch.*decoder"):
        import_state_dict(sd, variables, strict=True)


def test_temporal_kernel_and_no_gcn_variants_round_trip():
    # kernel_size>1 exercises the 1×K conv transform; gcn_bool=False
    # exercises the residual_conv named-module path
    cfg = ModelConfig(
        compute_dtype="float32",
        gwnet=GWNetConfig(kernel_size=2, gcn_bool=False, addaptadj=False),
    )
    variables = _variables(cfg)
    sd = export_state_dict(variables)
    assert sd["st_gnn.filter_convs.0.weight"].shape[-1] == 2  # [out,in,1,K]
    assert "st_gnn.residual_convs.0.weight" in sd
    out = import_state_dict(sd, variables, strict=True)
    _leaves_equal(out, variables)


def test_dcrnn_has_no_reference_mapping():
    cfg = ModelConfig(
        st_gnn="dcrnn", compute_dtype="float32", dcrnn=DCRNNConfig()
    )
    variables = _variables(cfg)
    with pytest.raises(ValueError, match="DCRNN"):
        import_state_dict({}, variables, strict=False)


def test_date2vec_pth_module_pickle_and_merge(tmp_path):
    torch = pytest.importorskip("torch")
    from multimodal_outage_tpu.parity.torch_import import (
        _register_date2vec_shim,
    )

    _register_date2vec_shim()
    import sys

    d2v = sys.modules["date2vec"].Date2Vec(k=64)
    pth = tmp_path / "d2v.pth"
    torch.save(d2v, str(pth))  # whole-module pickle, like the reference
    imported = date2vec_params_from_pth(str(pth))
    assert imported["fc1"]["kernel"].shape == (6, 32)
    np.testing.assert_allclose(
        imported["fc2"]["kernel"],
        d2v.fc2.weight.detach().numpy().T,
    )

    variables = _variables()
    merged = merge_date2vec(variables["params"], imported)
    np.testing.assert_allclose(
        np.asarray(merged["date2vec"]["fc1"]["bias"]),
        d2v.fc1.bias.detach().numpy(),
        rtol=1e-6,
    )
    # everything outside date2vec untouched
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["fc1"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["fc1"]["kernel"]),
    )


def test_convert_checkpoint_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from multimodal_outage_tpu.core.checkpoint import CheckpointManager
    from multimodal_outage_tpu.core.config import small_test_config

    cfg = small_test_config(n_counties=N, image_size=H, horizon=T)
    variables = _variables(ModelConfig(compute_dtype="float32"))
    sd = {
        f"model.{k}": torch.from_numpy(np.asarray(v))
        for k, v in export_state_dict(variables).items()
    }
    ckpt_file = tmp_path / "reference.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, str(ckpt_file))

    out_dir = str(tmp_path / "imported")
    info = convert_checkpoint(cfg, str(ckpt_file), out_dir)
    assert info["torch_keys"] == len(sd)

    mgr = CheckpointManager(out_dir)
    restored = mgr.restore()
    mgr.close()
    # date2vec is NOT in a Lightning checkpoint (the reference keeps it in
    # a separate .pth, utils.py:108-109) — the converter leaves its own
    # fresh init there unless --d2v_pth is given; compare the rest
    exp_p = {k: v for k, v in variables["params"].items() if k != "date2vec"}
    got_p = {k: v for k, v in restored["params"].items() if k != "date2vec"}
    _leaves_equal(got_p, exp_p)
    _leaves_equal(restored["batch_stats"], variables["batch_stats"])
    assert int(np.asarray(restored["step"])) == 0


def test_load_torch_checkpoint_fallback_is_narrow(tmp_path):
    """Advisor r4: the weights_only=True → False fallback must fire ONLY
    on torch's weights-only POLICY rejection (a valid pickle referencing
    module globals). A corrupt file must propagate its error instead of
    silently re-opening the arbitrary-code-execution unpickle path; a
    plain tensor state_dict must load without the fallback at all."""
    torch = pytest.importorskip("torch")
    from multimodal_outage_tpu.parity.torch_import import (
        _register_date2vec_shim,
        load_torch_checkpoint,
    )

    # 1. plain state_dict: weights_only path succeeds
    sd_file = tmp_path / "plain.pth"
    torch.save({"state_dict": {"w": torch.ones(2, 3)}}, str(sd_file))
    out = load_torch_checkpoint(str(sd_file))
    assert out["w"].shape == (2, 3)

    # 2. corrupt file: NOT a weights-only policy rejection — must raise,
    # never fall back to the full unpickler
    bad = tmp_path / "corrupt.pth"
    bad.write_bytes(b"this is not a torch checkpoint")
    with pytest.raises(Exception) as ei:
        load_torch_checkpoint(str(bad))
    assert "Unsupported global" not in str(ei.value)

    # 3. module pickle (the reference's d2v .pth shape, utils.py:108-109):
    # weights_only rejects the class global, the fallback loads it
    import sys

    _register_date2vec_shim()
    d2v = sys.modules["date2vec"].Date2Vec(k=64)
    mod_file = tmp_path / "module.pth"
    torch.save(d2v, str(mod_file))
    out = load_torch_checkpoint(str(mod_file))
    assert any("fc1" in k for k in out)
