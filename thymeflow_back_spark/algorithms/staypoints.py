"""Stay-point extraction: time-sequential clustering of a location track.

Behavioral port of the reference's stay detection (SURVEY.md §2.7:
TimeSequentialClusterEstimator/MaxLikelihoodCluster semantics — merge an
observation into the running cluster while the Hellinger distance between
the cluster's Gaussian and the observation's Gaussian stays below λ, within
a bounded lookback window; emit clusters that lasted ≥ min_stay). Local
math in numpy float64 (replacing the reference's log-space LogNum); runs
per user inside applyInPandas — the algorithm never sees more than one
user's time-sorted track.

Defaults mirror the reference constants (LocationStayEnricher.scala:52-55):
min stay 15 min, observation window 60 min, λ = 0.95.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MIN_STAY_US = 15 * 60 * 1_000_000
WINDOW_US = 60 * 60 * 1_000_000
LAMBDA = 0.95
_M_PER_DEG_LAT = 111_320.0


@dataclass(frozen=True)
class Stay:
    start_us: int
    end_us: int
    lon: float
    lat: float
    n_obs: int


def _hellinger_isotropic(mu1, s1, mu2, s2) -> float:
    """Hellinger distance between isotropic 2-D Gaussians (meters)."""
    v1, v2 = s1 * s1, s2 * s2
    denom = v1 + v2
    if denom <= 0:
        return 0.0 if np.allclose(mu1, mu2) else 1.0
    d2 = float(np.sum((mu1 - mu2) ** 2))
    bc = (2 * s1 * s2 / denom) * np.exp(-d2 / (4 * denom))
    return float(np.sqrt(max(0.0, 1.0 - bc)))


def extract_stays(
    t_us: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    accuracy_m: np.ndarray,
    min_stay_us: int = MIN_STAY_US,
    window_us: int = WINDOW_US,
    lam: float = LAMBDA,
    flush_tail: bool = True,
):
    """Extract stays from one user's time-sorted track (arrays same length).

    ``flush_tail=False`` is the STREAMING form: the trailing open cluster is
    NOT flushed (more observations may still join it); the return value is
    ``(closed_stays, open_start)`` where ``open_start`` is the index of the
    first observation still held by the open cluster (== n when none) — the
    caller keeps ``track[open_start:]`` as state for the next micro-batch.
    """
    n = len(t_us)
    if n == 0:
        return [] if flush_tail else ([], 0)
    lat0 = float(np.median(lat))
    m_per_deg_lon = _M_PER_DEG_LAT * np.cos(np.radians(lat0))
    x = lon * m_per_deg_lon
    y = lat * _M_PER_DEG_LAT

    stays: list[Stay] = []
    # running cluster: member indices (bounded by the lookback window)
    members: list[int] = []

    def cluster_state(idxs: list[int]) -> tuple[np.ndarray, float]:
        xs, ys = x[idxs], y[idxs]
        acc = np.maximum(accuracy_m[idxs], 1.0)
        w = 1.0 / (acc * acc)
        mu = np.array([np.average(xs, weights=w), np.average(ys, weights=w)])
        spread = float(np.sqrt(np.average((xs - mu[0]) ** 2 + (ys - mu[1]) ** 2, weights=w)))
        sigma = max(spread, float(np.average(acc, weights=w)))
        return mu, sigma

    def flush(idxs: list[int]) -> None:
        if not idxs:
            return
        duration = int(t_us[idxs[-1]] - t_us[idxs[0]])
        if duration >= min_stay_us:
            mu, _ = cluster_state(idxs)
            stays.append(
                Stay(
                    start_us=int(t_us[idxs[0]]),
                    end_us=int(t_us[idxs[-1]]),
                    lon=float(mu[0] / m_per_deg_lon),
                    lat=float(mu[1] / _M_PER_DEG_LAT),
                    n_obs=len(idxs),
                )
            )

    for i in range(n):
        if not members:
            members = [i]
            continue
        # bound the comparison window (reference: 60-min lookup window)
        recent = [j for j in members if t_us[i] - t_us[j] <= window_us]
        if not recent:
            flush(members)
            members = [i]
            continue
        mu, sigma = cluster_state(recent)
        obs_mu = np.array([x[i], y[i]])
        obs_sigma = max(float(accuracy_m[i]), 1.0)
        if _hellinger_isotropic(mu, sigma, obs_mu, obs_sigma) <= lam:
            members.append(i)
        else:
            flush(members)
            members = [i]
    if not flush_tail:
        # members is always a contiguous suffix (every index either joins
        # the running cluster or restarts it), so its first index is the
        # open-tail boundary
        return stays, (members[0] if members else n)
    flush(members)
    return stays
