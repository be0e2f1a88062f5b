"""Dump the optimized HLO of the b=8 e2e train step (for layout forensics).

Usage: python tools/dump_hlo.py [--batch 8] [--out /tmp/step_hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_outage_tpu import benchmarks as B
    from multimodal_outage_tpu.core.config import ModelConfig
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.state import create_train_state
    from multimodal_outage_tpu.train.steps import make_train_step

    t, s, b = 7, 128, args.batch
    store = load_store(B._e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    n = store.n_counties
    model = build_model(ModelConfig(compute_dtype="bfloat16"), horizon=t)
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    pipe = DevicePipeline(store, 3.2, 10.4, s)
    batch0 = pipe.batch(ds, np.arange(b))
    state = create_train_state(model, rng, batch0, supports)
    step = make_train_step(model, donate=False)
    lowered = step.lower(state, batch0, supports, jnp.float32(1e-3), rng)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out}: {len(txt)} chars", file=sys.stderr)


if __name__ == "__main__":
    main()
