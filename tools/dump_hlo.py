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

    from multimodal_outage_tpu import benchmarks as B

    # the EXACT program the headline bench runs (shared setup; see
    # benchmarks.make_e2e_setup — keeps this receipt from drifting)
    su = B.make_e2e_setup(args.batch, donate=False)
    step, state, batch0 = su["step"], su["state"], su["batch0"]
    lowered = step.lower(state, batch0, su["supports"], su["lr"], su["rng"])
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out}: {len(txt)} chars", file=sys.stderr)


if __name__ == "__main__":
    main()
