"""Distribution-drift math: KL divergence / PSI over partition objects.

Numpy-only (scipy absent in-sandbox; the reference's KS/chi² expectations are
scipy+pandas-engine-only upstream and are documented out of scope,
SURVEY.md §2.9).  Mirrors the reference's partition-object semantics
(ref: expectations/core/expect_column_kl_divergence_to_be_less_than.py):

- continuous partition: {"bins": [b0..bn], "weights": [w1..wn]}
- categorical partition: {"values": [...], "weights": [...]}
- tail_weight_holdout: expected mass reserved for values outside [b0, bn]
  (split equally between the two tails) / for unlisted categories
- internal_weight_holdout: expected mass spread equally over zero-weight
  internal bins
- observed mass in a region where expected mass is 0 → divergence = inf
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np


def _smooth_expected(
    weights: list[float],
    tail_weight_holdout: float,
    internal_weight_holdout: float,
) -> tuple[np.ndarray, float, float]:
    """Returns (internal expected weights, low-tail mass, high-tail mass)."""
    w = np.asarray(weights, dtype=float)
    scale = 1.0 - tail_weight_holdout - internal_weight_holdout
    w = w * scale / w.sum() if w.sum() > 0 else w
    if internal_weight_holdout > 0:
        zeros = w == 0
        if zeros.any():
            w = w + zeros * (internal_weight_holdout / zeros.sum())
    tail = tail_weight_holdout / 2.0
    return w, tail, tail


def _divergence(p: np.ndarray, q: np.ndarray, kind: str) -> float:
    """kind: 'kl' → Σ p·ln(p/q); 'psi' → Σ (p−q)·ln(p/q).  p>0 & q==0 → inf."""
    total = 0.0
    for pi, qi in zip(p, q):
        if pi == 0 and qi == 0:
            continue
        if qi == 0:
            return math.inf
        if pi == 0:
            if kind == "psi":
                return math.inf  # ln(0/q) → -inf with negative (p-q): undefined mass
            continue
        ratio = math.log(pi / qi)
        total += pi * ratio if kind == "kl" else (pi - qi) * ratio
    return total


def continuous_divergence(
    hist_counts: list[int],
    below_count: int,
    above_count: int,
    total_count: int,
    partition_object: dict[str, Any],
    tail_weight_holdout: float = 0.0,
    internal_weight_holdout: float = 0.0,
    kind: str = "kl",
) -> tuple[float, dict[str, Any]]:
    if total_count == 0:
        return math.nan, {}
    exp_w, lo_tail, hi_tail = _smooth_expected(
        list(partition_object["weights"]), tail_weight_holdout, internal_weight_holdout
    )
    obs = np.asarray(hist_counts, dtype=float) / total_count
    obs_lo = below_count / total_count
    obs_hi = above_count / total_count
    p = np.concatenate(([obs_lo], obs, [obs_hi]))
    q = np.concatenate(([lo_tail], exp_w, [hi_tail]))
    div = _divergence(p, q, kind)
    details = {
        "observed_partition": {
            "bins": list(partition_object["bins"]),
            "weights": obs.tolist(),
            "tail_weights": [obs_lo, obs_hi],
        },
        "expected_partition": {
            "bins": list(partition_object["bins"]),
            "weights": exp_w.tolist(),
            "tail_weights": [lo_tail, hi_tail],
        },
    }
    return div, details


def categorical_divergence(
    value_counts: dict[Any, int],
    total_count: int,
    partition_object: dict[str, Any],
    tail_weight_holdout: float = 0.0,
    kind: str = "kl",
) -> tuple[float, dict[str, Any]]:
    if total_count == 0:
        return math.nan, {}
    values = list(partition_object["values"])
    w = np.asarray(partition_object["weights"], dtype=float)
    w = w * (1.0 - tail_weight_holdout) / w.sum() if w.sum() > 0 else w
    obs = np.asarray([value_counts.get(v, 0) for v in values], dtype=float) / total_count
    # clamp: sketch-mode (CMS) counts are one-sided overestimates, so the
    # listed sum can slightly exceed the total
    unlisted = max(0.0, (total_count - sum(value_counts.get(v, 0) for v in values)) / total_count)
    p = np.concatenate((obs, [unlisted]))
    q = np.concatenate((w, [tail_weight_holdout]))
    div = _divergence(p, q, kind)
    details = {
        "observed_partition": {"values": values, "weights": obs.tolist(),
                               "unlisted_weight": unlisted},
        "expected_partition": {"values": values, "weights": w.tolist(),
                               "tail_weight_holdout": tail_weight_holdout},
    }
    return div, details
