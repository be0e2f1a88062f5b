import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import ModelConfig, GWNetConfig
from multimodal_outage_tpu.models.date2vec import Date2Vec
from multimodal_outage_tpu.models.dcrnn import DCRNN
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.models.gwnet import GraphWaveNet, nconv
from multimodal_outage_tpu.models.layers import GroupedBatchNorm
from multimodal_outage_tpu.models.unet import (
    BottleneckDecoder,
    BottleneckEncoder,
    Contraction,
    Expansion,
)

B, N, T, H, C = 2, 4, 3, 32, 1
KEY = jax.random.PRNGKey(0)


def _supports(n):
    return jnp.eye(n)[None]


def test_date2vec_encode_structure():
    m = Date2Vec(k=64)
    x = jax.random.normal(KEY, (5, 6))
    params = m.init(KEY, x)["params"]
    out = m.apply({"params": params}, x, method=m.encode)
    assert out.shape == (5, 64)
    # encode = concat([fc1(x), sin(fc2(x))]) (reference date2vec.py:49-53)
    w1, b1 = params["fc1"]["kernel"], params["fc1"]["bias"]
    w2, b2 = params["fc2"]["kernel"], params["fc2"]["bias"]
    expected = jnp.concatenate([x @ w1 + b1, jnp.sin(x @ w2 + b2)], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_grouped_batchnorm_per_group_stats():
    m = GroupedBatchNorm(num_group_axes=1)
    x = jax.random.normal(KEY, (3, 16, 2)) * 5 + 2
    variables = m.init(KEY, x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    # each group normalized independently to ~zero-mean unit-var
    y = np.asarray(y)
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=1), 1.0, atol=1e-2)


def test_grouped_batchnorm_stable_on_large_constant_planes():
    """Regression: E[x²]−μ² variance went negative → NaN on large
    near-constant inputs (seen at full 128² scale)."""
    x = jnp.full((2, 7 * 128 * 128, 1), 4.4721, jnp.float32)
    x = x + jax.random.normal(KEY, x.shape) * 1e-4
    m = GroupedBatchNorm(num_group_axes=1)
    variables = m.init(KEY, x, train=True)
    y, _ = m.apply(variables, x, train=True, mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(y)))


def test_grouped_batchnorm_eval_uses_running_stats():
    m = GroupedBatchNorm(num_group_axes=1)
    x = jax.random.normal(KEY, (3, 64, 2)) * 3 + 1
    variables = m.init(KEY, x, train=True)
    bs = variables["batch_stats"]
    # initial running stats: mean 0, var 1 ⇒ eval output == input (scale=1)
    y = m.apply({"params": variables["params"], "batch_stats": bs}, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
    # running stats follow the serial per-group EMA (torch loop order):
    # r' = 0.9^G·0 + Σ_k 0.1·0.9^(G−1−k)·mean_k
    _, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    means_k = np.asarray(x).mean(axis=1)  # [G, C]
    g = means_k.shape[0]
    w = 0.1 * 0.9 ** np.arange(g - 1, -1, -1, dtype=np.float32)
    np.testing.assert_allclose(new_mean, w @ means_k, atol=1e-5)


def test_contraction_shapes_and_skips():
    m = Contraction(base_channels=4, depth=4)
    x = jnp.zeros((B, N, T, H, H, C))
    variables = m.init(KEY, x, train=False)
    (bottleneck, skips), _ = m.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert bottleneck.shape == (B, N, T, H // 16, H // 16, 64)
    assert [s.shape[-1] for s in skips] == [4, 8, 16, 32]
    assert [s.shape[-2] for s in skips] == [H, H // 2, H // 4, H // 8]


def test_bottleneck_mlps_roundtrip_shapes():
    enc = BottleneckEncoder(feature_vector_size=256)
    x = jnp.zeros((B, N, T, 2, 2, 64))
    v = enc.init(KEY, x, train=False)
    z = enc.apply(v, x, train=False)
    assert z.shape == (B, N, T, 256)

    dec = BottleneckDecoder(grid_size=2, grid_channels=64)
    v = dec.init(KEY, z, train=False)
    d = dec.apply(v, z, train=False)
    assert d.shape == (B, N, T, 2, 2, 64)


def test_expansion_shapes():
    m = Expansion(output_channels=1, base_channels=4, depth=4)
    x = jnp.zeros((B, N, T, H // 16, H // 16, 64))
    skips = tuple(
        jnp.zeros((B, N, T, H // (2**i), H // (2**i), 4 * 2**i))
        for i in range(4)
    )
    variables = m.init(KEY, x, skips, train=False)
    y, _ = m.apply(variables, x, skips, train=True, mutable=["batch_stats"])
    assert y.shape == (B, N, T, H, H, 1)


def test_nconv_matches_reference_einsum():
    x = jax.random.normal(KEY, (1, 4, 3, 2))  # [B, N, T, C]
    a = jax.random.normal(KEY, (4, 4))
    out = nconv(x, a)
    # reference 'ncvl,vw->ncwl' on [B, C, N, T] layout
    x_t = jnp.transpose(x, (0, 3, 1, 2))
    ref = jnp.einsum("ncvl,vw->ncwl", x_t, a)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.transpose(ref, (0, 2, 3, 1))), atol=1e-5
    )


def test_gwnet_shapes_and_grads():
    m = GraphWaveNet(out_dim=16, skip_channels=8, end_channels=12,
                     residual_channels=6, dilation_channels=6)
    x = jax.random.normal(KEY, (B, N, T, 20))
    sup = _supports(N)
    variables = m.init({"params": KEY, "dropout": KEY}, x, sup, train=False)
    out = m.apply(variables, x, sup, train=False)
    assert out.shape == (B, N, T, 16)

    def loss(params):
        y = m.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, sup, train=False,
        )
        return jnp.sum(y**2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # adaptive adjacency factors receive gradient
    assert np.any(np.asarray(grads["nodevec1"]) != 0)


def test_gwnet_no_gcn_branch():
    """supports=None + addaptadj=False → 1×1 residual convs instead of
    graph diffusion (reference models/graph_wavenet.py:244-245)."""
    m = GraphWaveNet(out_dim=8, addaptadj=False,
                     residual_channels=4, dilation_channels=4,
                     skip_channels=6, end_channels=6, blocks=1, layers=2)
    x = jax.random.normal(KEY, (2, N, T, 10))
    variables = m.init({"params": KEY, "dropout": KEY}, x, None, train=False)
    out = m.apply(variables, x, None, train=False)
    assert out.shape == (2, N, T, 8)
    assert "residual_conv0" in variables["params"]
    assert "nodevec1" not in variables["params"]


def test_gwnet_temporal_kernel_preserves_length():
    m = GraphWaveNet(out_dim=8, kernel_size=2, blocks=2, layers=2,
                     residual_channels=4, dilation_channels=4,
                     skip_channels=6, end_channels=6)
    assert m.receptive_field == 7  # 1 + (1+2) + (1+2)
    x = jax.random.normal(KEY, (1, N, 5, 12))
    sup = _supports(N)
    variables = m.init({"params": KEY, "dropout": KEY}, x, sup, train=False)
    out = m.apply(variables, x, sup, train=False)
    assert out.shape == (1, N, 5, 8)


def test_gwnet_reference_view_quirk_is_permutation():
    """Quirk mode reproduces torch's .view memory reinterpret
    (reference models/graph_wavenet.py:189,255)."""
    n, t, c = 4, 3, 24
    x = jnp.arange(n * t * c, dtype=jnp.float32).reshape(1, n, t, c)
    scrambled = x.reshape(1, c, n, t).transpose(0, 2, 3, 1)
    # torch equivalence check via numpy reshape (same C-order reinterpret)
    xt = np.asarray(x[0])  # [N, T, C]
    torch_view = xt.reshape(c, n, t)  # .view(C, N, T)
    np.testing.assert_array_equal(
        np.asarray(scrambled[0]), np.transpose(torch_view, (1, 2, 0))
    )


def test_dcrnn_shapes():
    m = DCRNN(output_dim=16, horizon=T, rnn_units=8, num_rnn_layers=2,
              max_diffusion_step=2)
    x = jax.random.normal(KEY, (B, N, T, 12))
    sup = jnp.stack([jnp.eye(N), jnp.eye(N)])  # dual random walk
    variables = m.init(KEY, x, sup, train=False)
    out = m.apply(variables, x, sup, train=False)
    assert out.shape == (B, N, T, 16)


def test_dcrnn_teacher_forcing():
    """Scheduled sampling: with ratio 1 every decoder step feeds the
    ground-truth target; ratio 0 self-feeds (identical to no targets)."""
    m0 = DCRNN(output_dim=16, horizon=T, rnn_units=8, num_rnn_layers=2,
               teacher_forcing=0.0)
    m1 = DCRNN(output_dim=16, horizon=T, rnn_units=8, num_rnn_layers=2,
               teacher_forcing=1.0)
    x = jax.random.normal(KEY, (B, N, T, 12))
    targets = jax.random.normal(jax.random.PRNGKey(7), (B, N, T, 16))
    sup = jnp.eye(N)[None]
    variables = m0.init(KEY, x, sup, train=False)

    base = m0.apply(variables, x, sup, train=True, targets=targets,
                    rngs={"sampling": KEY})
    # ratio 0 with targets == self-feeding without targets
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(m0.apply(variables, x, sup, train=True)),
        atol=1e-6,
    )
    forced = m1.apply(variables, x, sup, train=True, targets=targets,
                      rngs={"sampling": KEY})
    # teacher-forced rollout diverges from self-fed after step 0 (step 0
    # shares the GO-symbol input, later steps see different prev inputs)
    assert not np.allclose(np.asarray(forced[:, :, 1:]),
                           np.asarray(base[:, :, 1:]), atol=1e-4)
    # eval mode ignores targets regardless of ratio
    ev0 = m1.apply(variables, x, sup, train=False)
    ev1 = m1.apply(variables, x, sup, train=False, targets=targets)
    np.testing.assert_allclose(np.asarray(ev0), np.asarray(ev1), atol=1e-6)


@pytest.mark.parametrize("st_gnn", ["gwnet", "dcrnn"])
def test_fusion_forward_and_grad(st_gnn):
    cfg = ModelConfig(st_gnn=st_gnn, compute_dtype="float32")
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (B, T, 1)
    )
    sup = _supports(N)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    y = model.apply(variables, x, feats, sup, train=False)
    assert y.shape == (B, N, T, H, H, 1)
    assert y.dtype == jnp.float32

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, feats, sup, train=False,
        )
        return jnp.mean(out**2)

    grads = jax.grad(loss)(variables["params"])
    assert all(
        np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads)
    )
    # date2vec is frozen by default (reference uses a frozen pretrained
    # checkpoint, utils.py:108-109)
    d2v_grads = jax.tree.leaves(grads["date2vec"])
    assert all(np.all(np.asarray(g) == 0) for g in d2v_grads)


def test_fusion_multichannel():
    """Multimodal fusion config: satellite + weather channels
    (BASELINE.md config 4; reference Modified_UNET input_channels param,
    models/unet.py:202)."""
    cfg = ModelConfig(input_channels=3, output_channels=2, compute_dtype="float32")
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (1, N, T, H, H, 3))
    feats = jnp.zeros((1, T, 6))
    sup = _supports(N)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    y = model.apply(variables, x, feats, sup, train=False)
    assert y.shape == (1, N, T, H, H, 2)


def test_svd_aptinit():
    """randomadj=False path: nodevecs become the SVD factorization of the
    first support (reference graph_wavenet.py:136-141)."""
    from multimodal_outage_tpu.models.gwnet import install_aptinit, svd_aptinit

    rng = np.random.default_rng(0)
    adj = rng.random((N, N)).astype(np.float32)
    e1, e2 = svd_aptinit(adj, node_embed_dim=N)  # full rank at tiny N
    np.testing.assert_allclose(e1 @ e2, adj, atol=1e-4)

    params = {"st_gnn": {"nodevec1": jnp.zeros((N, N)),
                         "nodevec2": jnp.zeros((N, N)),
                         "other": jnp.ones((2,))},
              "encoder": {"w": jnp.ones((2,))}}
    out = install_aptinit(params, adj, node_embed_dim=N)
    np.testing.assert_allclose(np.asarray(out["st_gnn"]["nodevec1"]), e1)
    np.testing.assert_allclose(np.asarray(out["st_gnn"]["nodevec2"]), e2)
    np.testing.assert_array_equal(np.asarray(out["st_gnn"]["other"]),
                                  np.asarray(params["st_gnn"]["other"]))
    # no adaptive adjacency → no-op
    assert install_aptinit({"st_gnn": {}}, adj, 4) == {"st_gnn": {}}


@pytest.mark.slow
def test_remat_matches_plain_forward_and_grad():
    """cfg.remat changes memory behavior only: identical params tree,
    identical outputs, gradients, and batch_stats updates."""
    cfg0 = ModelConfig(compute_dtype="float32", remat=False)
    cfg1 = ModelConfig(compute_dtype="float32", remat=True)
    m0 = build_model(cfg0, horizon=T)
    m1 = build_model(cfg1, horizon=T)
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.zeros((B, T, 6))
    sup = _supports(N)
    v = m0.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    # same param paths across the toggle (checkpoint interchangeability)
    v1 = m1.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)

    y0 = m0.apply(v, x, feats, sup, train=False)
    y1 = m1.apply(v, x, feats, sup, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    def loss(m):
        def f(params):
            yhat, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, feats, sup, train=True,
                rngs={"dropout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return jnp.mean(yhat**2), mut["batch_stats"]
        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, bs0), g0 = loss(m0)
    (l1, bs1), g1 = loss(m1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # recomputation reorders f32 reductions (and may pick different conv
    # backward algorithms); bitwise equality is not expected — only
    # numerical equivalence. Wiring bugs would be O(1) off, not 1e-5.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        g0, g1,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        bs0, bs1,
    )


def test_pool_reshape_matches_reduce_window():
    """The pairwise strided-slice 2×2 max-pool lowering is numerically identical
    to reduce_window in forward; gradients agree off exact ties (r3
    layout-copy fix, BENCHMARKS.md)."""
    from multimodal_outage_tpu.models.layers import max_pool_2x2

    x = jax.random.normal(KEY, (2, 3, 16, 16, 5))
    a = max_pool_2x2(x, "pairwise")
    b = max_pool_2x2(x, "reduce_window")
    assert a.shape == (2, 3, 8, 8, 5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # random floats ⇒ no intra-window ties ⇒ identical subgradients
    ga = jax.grad(lambda v: jnp.sum(max_pool_2x2(v, "pairwise") ** 2))(x)
    gb = jax.grad(
        lambda v: jnp.sum(max_pool_2x2(v, "reduce_window") ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)
    # odd spatial dims fall back to reduce_window
    xo = jax.random.normal(KEY, (2, 7, 7, 3))
    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2(xo, "pairwise")),
        np.asarray(max_pool_2x2(xo, "reduce_window")),
    )


def test_fusion_pool_toggle_matches():
    """ModelConfig.pool changes lowering only — identical eval forward."""
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.zeros((B, T, 6))
    sup = _supports(N)
    m0 = build_model(ModelConfig(compute_dtype="float32", pool="pairwise"), horizon=T)
    m1 = build_model(
        ModelConfig(compute_dtype="float32", pool="reduce_window"), horizon=T
    )
    v = m0.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    y0 = m0.apply(v, x, feats, sup, train=False)
    y1 = m1.apply(v, x, feats, sup, train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("scope", ["stem", "conv"])
def test_stem_remat_matches_plain_forward_and_grad(scope):
    """remat_scope='stem' (inc/down1/up3/up4 only) and 'conv' (all
    blocks, save-only-conv-outputs policy) are memory/layout levers
    only: identical param tree, outputs, gradients, batch stats."""
    cfg0 = ModelConfig(compute_dtype="float32", remat=False)
    cfg1 = ModelConfig(
        compute_dtype="float32", remat=True, remat_scope=scope
    )
    m0 = build_model(cfg0, horizon=T)
    m1 = build_model(cfg1, horizon=T)
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.zeros((B, T, 6))
    sup = _supports(N)
    v = m0.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    v1 = m1.init({"params": KEY, "dropout": KEY}, x, feats, sup, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    np.testing.assert_allclose(
        np.asarray(m0.apply(v, x, feats, sup, train=False)),
        np.asarray(m1.apply(v, x, feats, sup, train=False)),
        atol=1e-6,
    )

    def loss(m):
        def f(params):
            yhat, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, feats, sup, train=True,
                rngs={"dropout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return jnp.mean(yhat**2), mut["batch_stats"]
        return jax.value_and_grad(f, has_aux=True)(v["params"])

    (l0, bs0), g0 = loss(m0)
    (l1, bs1), g1 = loss(m1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        ),
        g0, g1,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        bs0, bs1,
    )


def test_model_config_rejects_invalid_remat_scope_and_pool():
    """argparse choices only guard the CLI; direct construction with a
    typo'd scope must fail fast instead of silently acting as stem-scope
    remat / reduce_window pooling."""
    import pytest

    from multimodal_outage_tpu.core.config import ModelConfig

    with pytest.raises(ValueError, match="remat_scope"):
        ModelConfig(remat=True, remat_scope="full")
    with pytest.raises(ValueError, match="pool"):
        ModelConfig(pool="maxpool")
    # the valid values still construct
    ModelConfig(remat_scope="stem", pool="pairwise")
    ModelConfig(remat_scope="conv", pool="pallas")


def test_fusion_bf16_preserves_year_resolution():
    """The Date2Vec sub-path must run in f32 even under bf16 compute:
    years ~2022 quantize to multiples of 8 in bf16 (2017..2027 collapse
    onto 2016/2024), so a bf16 cast of the RAW date features would make
    consecutive years produce identical embeddings/outputs."""
    cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (1, N, T, H, H, 1))
    sup = _supports(N)

    def feats(year):
        return jnp.tile(
            jnp.array([0, 0, 0, year, 9, 26], jnp.float32), (1, T, 1)
        )

    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats(2022), sup, train=False
    )
    y22 = model.apply(variables, x, feats(2022), sup, train=False)
    y23 = model.apply(variables, x, feats(2023), sup, train=False)
    # 2022 and 2023 both round to 2024 in bf16 — outputs must differ
    assert np.any(np.asarray(y22) != np.asarray(y23))


@pytest.mark.parametrize("remat", [False, True])
def test_fusion_sample_weight_plumbing(remat):
    """sample_weight threads from the fusion forward through every BN
    (contraction, expansion, gwnet): a padded batch with the pad row
    masked must mutate batch_stats exactly like the ragged batch, and
    valid-row outputs are untouched. remat=True proves the traced weight
    rides through the nn.remat-wrapped blocks (static_argnums only pin
    `train`). Dropout is zeroed so the padded-vs-ragged comparison does
    not lean on the PRNG's prefix-consistency across batch shapes (a
    threefry implementation detail, not a contract)."""
    cfg = ModelConfig(
        compute_dtype="float32", remat=remat, remat_scope="conv",
        encoder_dropout=0.0, gwnet=GWNetConfig(dropout=0.0),
    )
    model = build_model(cfg, horizon=T)
    rng = np.random.default_rng(8)
    xv = rng.normal(size=(3, N, T, H, H, 1)).astype(np.float32)
    x = jnp.asarray(np.resize(xv, (4, N, T, H, H, 1)))
    sw = jnp.array([1, 1, 1, 0], jnp.float32)
    feats3 = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (3, T, 1)
    )
    feats4 = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (4, T, 1)
    )
    sup = _supports(N)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats4, sup, train=False
    )

    out, masked = model.apply(
        variables, x, feats4, sup, train=True, sample_weight=sw,
        rngs={"dropout": KEY}, mutable=["batch_stats"],
    )
    out_v, compact = model.apply(
        variables, jnp.asarray(xv), feats3, sup, train=True,
        rngs={"dropout": KEY}, mutable=["batch_stats"],
    )
    a_leaves = jax.tree.leaves(masked["batch_stats"])
    b_leaves = jax.tree.leaves(compact["batch_stats"])
    assert a_leaves and len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
