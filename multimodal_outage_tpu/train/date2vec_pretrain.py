"""Date2Vec pre-training.

The reference loads a pre-trained Date2Vec checkpoint
(`d2v_98291_17.16...pth`, a fully pickled torch module absent from the
snapshot — reference utils.py:108-109, SURVEY §8.3) and freezes it. This
utility trains a replacement from scratch: the Date2Vec autoencoder
(date2vec.py:40-47 head) learns to reconstruct date vectors
[0, 0, 0, y, m, d] over a span of years, then the encoder params are saved
as a plain .npz array bundle (no pickled code) that slots into the fusion
model's `date2vec` param subtree.
"""

from __future__ import annotations

import datetime
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_outage_tpu.models.date2vec import Date2Vec


def date_vector_dataset(
    start_year: int = 2012, end_year: int = 2026
) -> np.ndarray:
    """All [0,0,0,y,m,d] vectors across the year span."""
    start = datetime.date(start_year, 1, 1)
    end = datetime.date(end_year, 12, 31)
    n = (end - start).days + 1
    rows = np.zeros((n, 6), np.float32)
    for i in range(n):
        d = start + datetime.timedelta(days=i)
        rows[i, 3:] = (d.year, d.month, d.day)
    return rows


# Date-feature normalization used ONLY during pre-training; it is folded
# into the fc1/fc2 weights at save time so the saved encoder consumes raw
# [0,0,0,y,m,d] vectors exactly like the reference checkpoint did.
_OFFSET = np.array([0, 0, 0, 2019.0, 6.5, 15.5], np.float32)
_SCALE = np.array([1, 1, 1, 8.0, 3.5, 9.0], np.float32)


def _fold_normalization(params: Dict) -> Dict:
    """Rewrite fc1/fc2 so that fc(x_raw) == fc_trained((x_raw−off)/sc).

    For a linear layer out = x_norm·W + b:
      W' = W / sc[:, None],  b' = b − (off/sc)·W.
    """
    out = jax.tree.map(np.asarray, params)
    for layer in ("fc1", "fc2"):
        w = out[layer]["kernel"]
        b = out[layer]["bias"]
        out[layer] = {
            "kernel": w / _SCALE[:, None],
            "bias": b - (_OFFSET / _SCALE) @ w,
        }
    return out


def pretrain_date2vec(
    k: int = 64,
    steps: int = 2000,
    batch_size: int = 256,
    lr: float = 1e-3,
    seed: int = 42,
) -> Tuple[Dict, float]:
    """Train the autoencoder on normalized date features, then fold the
    normalization into the encoder weights; returns (params, final loss).

    The returned fc1/fc2 accept raw [0,0,0,y,m,d] inputs (the fusion
    model's contract, reference utils.py:124-126)."""
    data = date_vector_dataset()
    data_norm = (data - _OFFSET) / _SCALE

    model = Date2Vec(k=k)
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, 6)), train=False
    )
    params = variables["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, drop_rng):
        def loss_fn(p):
            recon = model.apply(
                {"params": p}, batch, train=True, rngs={"dropout": drop_rng}
            )
            return jnp.mean(jnp.square(recon - batch))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    np_rng = np.random.default_rng(seed)
    loss = jnp.inf
    for i in range(steps):
        idx = np_rng.integers(0, data_norm.shape[0], batch_size)
        batch = jnp.asarray(data_norm[idx])
        rng, drop = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, batch, drop)
    return _fold_normalization(params), float(loss)


def save_bundle(params: Dict, path: str) -> None:
    """Flat .npz of the param pytree (no pickled code, unlike the
    reference's torch.save of a whole module)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(k.key) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_bundle(path: str) -> Dict:
    """.npz → nested params dict for the date2vec subtree."""
    flat = np.load(path)
    out: Dict = {}
    for name in flat.files:
        node = out
        *parents, leaf = name.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = flat[name]
    return out


def install_bundle(model_params: Dict, bundle: Dict) -> Dict:
    """Return model params with the date2vec subtree replaced (encoder
    layers only — fc1/fc2 are what the fusion forward uses)."""
    new = dict(model_params)
    d2v = dict(new["date2vec"])
    for key in ("fc1", "fc2"):
        if key in bundle:
            d2v[key] = jax.tree.map(jnp.asarray, bundle[key])
    new["date2vec"] = d2v
    return new
