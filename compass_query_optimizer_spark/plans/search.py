"""Join-order search: DFS over connected traversals with memoized sketch
estimates and branch-and-bound pruning.

Faithful rebuild of the reference's driver-side search (SURVEY.md §4.2;
RelAlgExecutor.cpp:2190 get_distinct_graph_traversals, :2068
estimate_join_size — algorithm re-derived from its documented behavior):

- enumerate left-deep table orders that never introduce a cartesian
  product (each next table must join something already in the prefix);
- cost(order) = Σ estimated sizes of every *intermediate* prefix (the
  final full join is excluded — every order produces it);
- children are visited in ascending "sketch complexity" (filtered rows ×
  number of join columns, the reference's start-node priority,
  RelAlgExecutor.cpp:1459);
- estimates per prefix-subset are memoized (bottom_up_table keyed by the
  sorted subset, :2085-2087) and the DFS stops expanding once the running
  cost exceeds the best complete order (branch & bound, :2239-2246);
- a global expansion budget (default 100, :2209 'greedy mode') bounds
  planning time; raise it for exhaustive search;
- fallback when the graph is disconnected or sketches are missing: order
  tables by row count *descending* — MapD's default heuristic
  (RelAlgExecutor.cpp:2608-2621).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from compass_query_optimizer_spark.plans.fagms import (
    Sketch,
    estimate_multi_way,
    estimate_two_way,
)
from compass_query_optimizer_spark.plans.graph import JoinGraph

DEFAULT_BUDGET = 100  # node expansions ("greedy"; reference traverse_bound)


@dataclass
class TableStats:
    """Per-alias planning inputs from the push-down pass."""

    rows: int  # surviving rows after its filter
    sketches: dict[str, Sketch]  # join column -> sketch (post-filter)

    def complexity(self) -> float:
        return self.rows * max(1, len(self.sketches))


@dataclass
class SearchResult:
    order: list[str]
    cost: float
    expansions: int
    exhausted: bool  # budget hit before full enumeration
    fallback: bool = False
    prefix_estimates: dict[frozenset, float] = field(default_factory=dict)


def _subset_estimate(
    graph: JoinGraph,
    stats: dict[str, TableStats],
    subset: frozenset,
    memo: dict[frozenset, float],
) -> float:
    """Sketch estimate of the join size of a connected alias subset.

    Plane selection: each alias contributes ONE column plane; candidates
    are its join columns active on edges inside the subset. Multi-plane
    tables greedily take the plane minimizing the estimate holding the
    others fixed (the reference's Choose_Sketch_Min_Val heuristic,
    Sketches.h:101, RelAlgExecutor.cpp:2143-2169).
    """
    if subset in memo:
        return memo[subset]
    active: dict[str, list[str]] = {a: [] for a in subset}
    for a, ca, b, cb in graph.edges_within(subset):
        if ca not in active[a]:
            active[a].append(ca)
        if cb not in active[b]:
            active[b].append(cb)
    aliases = sorted(subset)
    chosen = {a: (active[a][0] if active[a] else None) for a in aliases}
    # aliases with no active edge inside the subset (shouldn't happen for
    # connected prefixes) fall back to any sketch
    for a in aliases:
        if chosen[a] is None:
            cols = list(stats[a].sketches)
            chosen[a] = cols[0] if cols else None

    def current_estimate() -> float:
        planes = [stats[a].sketches[chosen[a]] for a in aliases if chosen[a] is not None]
        if len(planes) < 2:
            return float(min(stats[a].rows for a in aliases))
        if len(planes) == 2:
            return estimate_two_way(planes[0], planes[1])
        return estimate_multi_way(planes)

    est = current_estimate()
    for a in aliases:
        if len(active[a]) > 1:
            for cand in active[a][1:]:
                prev = chosen[a]
                chosen[a] = cand
                e2 = current_estimate()
                if e2 < est:
                    est = e2
                else:
                    chosen[a] = prev
    memo[subset] = est
    return est


def fallback_order(stats: dict[str, TableStats]) -> list[str]:
    """MapD default: biggest table first (RelAlgExecutor.cpp:2608-2621)."""
    return sorted(stats, key=lambda a: (-stats[a].rows, a))


def order_cost(
    graph: JoinGraph,
    stats: dict[str, TableStats],
    order: list[str],
    memo: dict[frozenset, float] | None = None,
) -> float:
    """Σ estimated intermediate sizes for a given order (for comparisons)."""
    memo = {} if memo is None else memo
    cost = 0.0
    for k in range(2, len(order)):
        cost += _subset_estimate(graph, stats, frozenset(order[:k]), memo)
    return cost


def choose_join_order(
    graph: JoinGraph,
    stats: dict[str, TableStats],
    budget: int = DEFAULT_BUDGET,
) -> SearchResult:
    aliases = list(graph.spec.tables)
    if len(aliases) <= 2:
        return SearchResult(fallback_order(stats), 0.0, 0, False)
    if not graph.is_connected() or any(not s.sketches for s in stats.values()):
        return SearchResult(fallback_order(stats), float("inf"), 0, False, fallback=True)

    memo: dict[frozenset, float] = {}
    best_cost = float("inf")
    best_order: list[str] | None = None
    expansions = 0
    budget_hit = False

    def by_complexity(items):
        return sorted(items, key=lambda a: (stats[a].complexity(), a))

    def dfs(order: list[str], visited: frozenset, cost: float) -> None:
        nonlocal best_cost, best_order, expansions, budget_hit
        if expansions >= budget:
            budget_hit = True
            return
        if len(order) == len(aliases):
            if cost < best_cost:
                best_cost, best_order = cost, list(order)
            return
        for nxt in by_complexity(graph.neighbors(visited)):
            expansions += 1
            new_visited = visited | {nxt}
            # intermediate prefixes only: the full join is excluded
            step = (
                _subset_estimate(graph, stats, new_visited, memo)
                if len(new_visited) < len(aliases)
                else 0.0
            )
            new_cost = cost + step
            if new_cost >= best_cost:  # branch & bound
                continue
            order.append(nxt)
            dfs(order, new_visited, new_cost)
            order.pop()
            if expansions >= budget:
                budget_hit = True
                return

    for start in by_complexity(aliases):
        dfs([start], frozenset([start]), 0.0)
        if expansions >= budget:
            budget_hit = True
            break

    if best_order is None:  # budget too small to finish any traversal
        return SearchResult(fallback_order(stats), float("inf"), expansions, True, fallback=True)
    return SearchResult(best_order, best_cost, expansions, budget_hit, prefix_estimates=memo)
