"""Min-cost max-flow (successive shortest augmenting paths with potentials).

Reference capability: graph/FlowAlgorithms.scala:24-120 — used for
fractional query↔text assignment in TextAlignment. Graphs here are tiny
(token-level trellises), so an O(V·E·flow) SPFA-based implementation is
ample; it runs per candidate pair inside a Pandas UDF.
"""

from __future__ import annotations

from collections import defaultdict


def min_cost_max_flow(
    n: int,
    edges: list[tuple[int, int, float, float]],
    source: int,
    sink: int,
) -> tuple[float, float, list[tuple[int, int, float]]]:
    """Compute max flow of min cost.

    ``edges``: (u, v, capacity, cost). Returns (total_flow, total_cost,
    edge_flows) where edge_flows lists (u, v, flow) for original edges.
    """
    # adjacency with residual arcs; parallel arrays
    to: list[int] = []
    cap: list[float] = []
    cost: list[float] = []
    adj: dict[int, list[int]] = defaultdict(list)

    def add_edge(u: int, v: int, c: float, w: float) -> int:
        idx = len(to)
        to.append(v), cap.append(c), cost.append(w), adj[u].append(idx)
        to.append(u), cap.append(0.0), cost.append(-w), adj[v].append(idx + 1)
        return idx

    ids = [add_edge(u, v, c, w) for u, v, c, w in edges]

    total_flow = 0.0
    total_cost = 0.0
    eps = 1e-12
    while True:
        # SPFA (Bellman-Ford queue) shortest path by cost on residual graph
        dist = [float("inf")] * n
        in_queue = [False] * n
        prev_edge = [-1] * n
        dist[source] = 0.0
        queue = [source]
        in_queue[source] = True
        while queue:
            u = queue.pop(0)
            in_queue[u] = False
            for ei in adj[u]:
                if cap[ei] > eps and dist[u] + cost[ei] < dist[to[ei]] - eps:
                    dist[to[ei]] = dist[u] + cost[ei]
                    prev_edge[to[ei]] = ei
                    if not in_queue[to[ei]]:
                        queue.append(to[ei])
                        in_queue[to[ei]] = True
        if dist[sink] == float("inf"):
            break
        # bottleneck along the path
        push = float("inf")
        v = sink
        while v != source:
            ei = prev_edge[v]
            push = min(push, cap[ei])
            v = to[ei ^ 1]
        v = sink
        while v != source:
            ei = prev_edge[v]
            cap[ei] -= push
            cap[ei ^ 1] += push
            v = to[ei ^ 1]
        total_flow += push
        total_cost += push * dist[sink]

    edge_flows = [(edges[i][0], edges[i][1], cap[ids[i] ^ 1]) for i in range(len(edges))]
    return total_flow, total_cost, edge_flows
