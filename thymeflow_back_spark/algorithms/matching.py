"""Hungarian algorithm: min-cost bipartite assignment (O(n³)).

Reference capability: graph/BipartiteMatching.scala:35-270, used by
BipartiteMatchingDistance for token-to-token name similarity. Matrices are
tiny (name-token counts), evaluated per candidate pair inside a UDF.
"""

from __future__ import annotations


def hungarian(cost: list[list[float]]) -> tuple[float, list[int]]:
    """Solve min-cost assignment for a rectangular cost matrix.

    Returns (total_cost, assignment) where assignment[i] is the column
    assigned to row i (or -1 when rows > cols and row i is unassigned).
    Standard potentials + augmenting-path formulation.
    """
    n = len(cost)
    if n == 0:
        return 0.0, []
    m = len(cost[0])
    transposed = n > m
    if transposed:
        cost = [[cost[i][j] for i in range(n)] for j in range(m)]
        n, m = m, n

    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row matched to column j (1-based)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, m + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j], way[j] = cur, j0
                    if minv[j] < delta:
                        delta, j1 = minv[j], j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    assignment_small = [-1] * n
    total = 0.0
    for j in range(1, m + 1):
        if p[j]:
            assignment_small[p[j] - 1] = j - 1
            total += cost[p[j] - 1][j - 1]
    if not transposed:
        return total, assignment_small
    # translate back: we solved the transposed problem
    big_n = m
    assignment = [-1] * big_n
    for small_row, col in enumerate(assignment_small):
        if col >= 0:
            assignment[col] = small_row
    return total, assignment
