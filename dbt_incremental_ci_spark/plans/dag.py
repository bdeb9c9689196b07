"""DAG utilities: topological sort + descendant closure.

Driver-side pure Python — the DAG has O(100) nodes; no Spark constructs
needed (SURVEY §1.1 "The DAG itself").
"""

from __future__ import annotations

from graphlib import TopologicalSorter


def topo_sort(parent_map: dict[str, list[str]]) -> list[str]:
    """Dependency-first ordering; raises on cycles (graphlib.CycleError)."""
    ts = TopologicalSorter(parent_map)
    return list(ts.static_order())


def descendants(child_map: dict[str, list[str]], roots: set[str]) -> set[str]:
    """Transitive closure of children — dbt's ``state:modified+`` selector
    (ref SRC/dbt_helper.py:35-42 uses ``--select state:modified+``)."""
    out: set[str] = set()
    frontier = list(roots)
    while frontier:
        node = frontier.pop()
        for child in child_map.get(node, []):
            if child not in out:
                out.add(child)
                frontier.append(child)
    return out
