"""Hurricane case-study registry and model registry.

The reference duplicates the hurricane→date dicts in four files
(reference lit.py:148-156, tlit.py:42-44, find_mean_std.py:9-13,
eda/util.py:23-25). Here they are defined exactly once.
"""

from __future__ import annotations

import datetime
from typing import Callable, Dict

# Hurricane landfall dates (reference lit.py:149-156).
HURRICANES: Dict[str, datetime.date] = {
    "michael": datetime.date(2018, 10, 10),
    "ian": datetime.date(2022, 9, 26),
    "idalia": datetime.date(2023, 8, 30),
}

# Risk-map "normal" baseline: the monthly composites averaged per event
# year — pre-season months, hardcoded per year exactly as the reference
# (reference utils.py:262-269: 2018/2022 → Jun-Aug, 2023 → Apr-Jun).
RISK_MONTHS: Dict[int, tuple] = {
    2018: (6, 7, 8),
    2022: (6, 7, 8),
    2023: (4, 5, 6),
}


def leave_one_out(test_case: str) -> tuple[dict, dict]:
    """Leave-one-hurricane-out protocol (reference lit.py:148-158).

    Returns (train_val_cases, test_cases) as {name: date} dicts.
    """
    if test_case not in HURRICANES:
        raise ValueError(
            f"Unknown test case {test_case!r}; pick one of {sorted(HURRICANES)}"
        )
    train_val = {k: v for k, v in HURRICANES.items() if k != test_case}
    test = {test_case: HURRICANES[test_case]}
    return train_val, test


# st-GNN model registry: the reference selects by string with a hardcoded
# device (reference models/unet.py:209-214); here it is a plain registry of
# constructors, device-agnostic.
_ST_GNN_REGISTRY: Dict[str, Callable] = {}


def register_st_gnn(name: str):
    def deco(fn):
        _ST_GNN_REGISTRY[name] = fn
        return fn

    return deco


def get_st_gnn(name: str):
    if name not in _ST_GNN_REGISTRY:
        raise ValueError(
            f"Unknown st-GNN {name!r}; registered: {sorted(_ST_GNN_REGISTRY)}"
        )
    return _ST_GNN_REGISTRY[name]


def registered_st_gnns():
    return sorted(_ST_GNN_REGISTRY)
