import numpy as np
import pytest

from multimodal_outage_tpu.data import adjacency


def test_load_florida_csv():
    names, adj = adjacency.load_adjacency_csv()
    assert len(names) == 67
    assert adj.shape == (67, 67)
    assert set(np.unique(adj)).issubset({0.0, 1.0})
    # contiguity is symmetric
    np.testing.assert_array_equal(adj, adj.T)
    assert names[0].lower() == "alachua"


def test_asym_adj_row_stochastic():
    a = np.array([[0, 1, 1], [1, 0, 0], [0, 0, 0]], dtype=np.float32)
    t = adjacency.asym_adj(a)
    np.testing.assert_allclose(t.sum(1), [1.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(t[0], [0.0, 0.5, 0.5], atol=1e-6)


def test_supports_identity_matches_reference_quirk():
    # reference "doubletransition" returns [I] (reference utils.py:171-172)
    _, adj = adjacency.load_adjacency_csv()
    sup = adjacency.build_supports(adj, "identity")
    assert len(sup) == 1
    np.testing.assert_array_equal(sup[0], np.eye(67, dtype=np.float32))


def test_supports_true_doubletransition():
    _, adj = adjacency.load_adjacency_csv()
    sup = adjacency.build_supports(adj, "doubletransition")
    assert len(sup) == 2
    np.testing.assert_allclose(sup[0], adjacency.asym_adj(adj), atol=1e-6)
    np.testing.assert_allclose(sup[1], adjacency.asym_adj(adj.T), atol=1e-6)


def test_unknown_adjtype_raises():
    with pytest.raises(ValueError):
        adjacency.build_supports(np.eye(3), "bogus")


def test_synthetic_adjacency_symmetric():
    a = adjacency.synthetic_adjacency(10, seed=1)
    np.testing.assert_array_equal(a, a.T)
    assert np.all(np.diag(a) == 0)
