#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Flagship: END-TO-END fusion-model (U-Net + Graph WaveNet + Date2Vec)
training throughput — HBM-resident window gather + normalize + full
train step — in 128×128 tiles/sec/chip on the local accelerator.
vs_baseline is relative to the BASELINE.json north star (5,000 tiles/sec/chip).
"""

import json
import sys


def main() -> int:
    from multimodal_outage_tpu.benchmarks import run_benchmark

    result = run_benchmark("e2e_train", steps=20)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
