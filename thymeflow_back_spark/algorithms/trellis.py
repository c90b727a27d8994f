"""Movement/stay state smoothing: Viterbi over a movement trellis.

Behavioral parity with the reference's treillis StateEstimator (SURVEY.md
§2.7): observations (speeds between consecutive points) are smoothed into
{STATIONARY, MOVING} states by a min-cost path through the state trellis —
the reference solves the same DP with Dijkstra/A*; plain Viterbi is the
textbook equivalent for a chain. Costs in negative-log space.
"""

from __future__ import annotations

import math

STATIONARY, MOVING = 0, 1
STATES = (STATIONARY, MOVING)


def _emission_cost(speed_mps: float, state: int, still_speed: float = 1.5) -> float:
    """Negative-log pseudo-likelihood of a speed under each state."""
    if state == STATIONARY:
        # stationary tolerates GPS jitter up to ~still_speed; the penalty is
        # CAPPED (robust loss) so a single glitchy fix cannot outweigh an
        # entire stationary segment — only sustained movement flips the state
        return 0.1 + min(4.0, max(0.0, (speed_mps - still_speed)) ** 2 / 8.0)
    # moving strongly dislikes very low speeds (steeper than the
    # stationary penalty so a still segment is never cheaper to label moving)
    return 0.6 + min(4.0, 1.5 * max(0.0, (still_speed - speed_mps)) ** 2)


def viterbi_states(
    speeds_mps: list[float],
    switch_cost: float = 2.0,
    still_speed: float = 1.5,
) -> list[int]:
    """Smoothed state per observation gap (len == len(speeds))."""
    n = len(speeds_mps)
    if n == 0:
        return []
    INF = math.inf
    cost = {s: _emission_cost(speeds_mps[0], s, still_speed) for s in STATES}
    back: list[dict[int, int]] = []
    for i in range(1, n):
        new_cost: dict[int, float] = {}
        bp: dict[int, int] = {}
        for s in STATES:
            best_prev, best_c = -1, INF
            for p in STATES:
                c = cost[p] + (switch_cost if p != s else 0.0)
                if c < best_c:
                    best_prev, best_c = p, c
            new_cost[s] = best_c + _emission_cost(speeds_mps[i], s, still_speed)
            bp[s] = best_prev
        cost, _ = new_cost, back.append(bp)
    last = min(STATES, key=lambda s: cost[s])
    out = [last]
    for bp in reversed(back):
        last = bp[last]
        out.append(last)
    out.reverse()
    return out
