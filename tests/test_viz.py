import numpy as np

from multimodal_outage_tpu.viz import maps


def test_ntl_to_np_matches_reference_semantics():
    """denorm → transpose → rot90 → [0] (reference utils.py:184-192)."""
    h, w = 4, 6
    ntl = np.arange(h * w, dtype=np.float32).reshape(h, w, 1)
    out = maps.ntl_to_np(ntl, mean=1.0, std=2.0)
    ref = ntl[..., 0] * 2.0 + 1.0  # [H, W]
    ref = np.rot90(ref.T[None], k=1, axes=(1, 2))[0]
    np.testing.assert_allclose(out, ref)
    assert out.shape == (h, w)  # transpose+rot90 compose back to (H, W)


def test_percent_of_normal():
    ntl = np.array([[9.0]])
    normal = np.array([[4.0]])
    np.testing.assert_allclose(
        maps.percent_of_normal(ntl, normal), [[100 * 10 / 5]]
    )


def test_save_prediction_rasters(tmp_path):
    preds = np.random.default_rng(0).normal(size=(2, 4, 3, 8, 8, 1)).astype(
        np.float32
    )
    written = maps.save_prediction_rasters(
        preds,
        str(tmp_path),
        mean=3.0,
        std=10.0,
        county_names=[f"c{i}" for i in range(4)],
        county_idx=(0, 2),
        max_samples=1,
    )
    # 1 sample × 3 horizons × 2 counties
    assert len(written) == 6
    import os

    assert all(os.path.exists(p) for p in written)


def test_save_risk_maps(tmp_path, tiny_store):
    preds = np.random.default_rng(0).normal(
        size=(1, tiny_store.n_counties, 2, 16, 16, 1)
    ).astype(np.float32)
    written = maps.save_risk_maps(
        preds,
        tiny_store,
        str(tmp_path),
        mean=3.0,
        std=10.0,
        county_idx=(0, 1),
        max_samples=1,
    )
    assert len(written) == 4  # 1 sample × 2 horizons × 2 counties
