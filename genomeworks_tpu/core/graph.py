"""Host graph type with DOT / GFA serialization.

TPU-native counterpart of the reference's adjacency-list host graph
(common/base/include/.../utils/graph.hpp:50 Graph, :226 DirectedGraph;
node_labels_to_dot :155, edges_to_gfa :195). Used to export POA graphs
(Batch::get_graphs) and for general graph output.
"""

from __future__ import annotations


class Graph:
    """Adjacency-list graph with string node labels and weighted edges."""

    def __init__(self) -> None:
        self._adjacent: dict[int, list[int]] = {}
        self._edges: dict[tuple[int, int], int] = {}
        self._labels: dict[int, str] = {}

    # -- construction ------------------------------------------------------
    def _add_directed_edge(self, source: int, sink: int) -> None:
        self._adjacent.setdefault(source, []).append(sink)

    def update_adjacent_nodes(self, source: int, sink: int) -> None:
        self._add_directed_edge(source, sink)

    def set_node_label(self, node: int, label: str) -> None:
        self._labels[node] = label

    # -- queries -----------------------------------------------------------
    def get_adjacent_nodes(self, node: int) -> list[int]:
        return list(self._adjacent.get(node, ()))

    def get_node_label(self, node: int) -> str:
        return self._labels.get(node, "")

    def get_node_ids(self) -> list[int]:
        ids = set(self._adjacent)
        for u, v in self._edges:
            ids.add(u)
            ids.add(v)
        ids.update(self._labels)
        return sorted(ids)

    def get_edges(self) -> list[tuple[tuple[int, int], int]]:
        return list(self._edges.items())

    def get_edge_weight(self, source: int, sink: int) -> int | None:
        return self._edges.get((source, sink))

    # -- serialization (graph.hpp:155-224,268-281) --------------------------
    def _node_labels_to_dot(self) -> list[str]:
        return [f'{n} [label="{l}"];' for n, l in self._labels.items()]

    def _edges_to_dot(self, sep: str) -> list[str]:
        return [
            f'{u} {sep} {v} [label="{w}"];' for (u, v), w in self._edges.items()
        ]

    def serialize_to_gfa(self) -> str:
        """GFA v1: S line per labeled node, L line per edge."""
        lines = ["H\tVN:Z:1.0"]
        lines += [f"S\t{n}\t{l}" for n, l in self._labels.items()]
        lines += [f"L\t{u}\t+\t{v}\t+\t*" for (u, v) in self._edges]
        return "\n".join(lines) + "\n"


class DirectedGraph(Graph):
    """Directed graph (graph.hpp:226)."""

    def add_edge(self, source: int, sink: int, weight: int = 0) -> None:
        key = (source, sink)
        if key not in self._edges:
            self._edges[key] = weight
            self._add_directed_edge(source, sink)
        else:
            self._edges[key] += weight

    def serialize_to_dot(self) -> str:
        lines = ["digraph g {"]
        lines += self._node_labels_to_dot()
        lines += self._edges_to_dot("->")
        lines.append("}")
        return "\n".join(lines) + "\n"


class UndirectedGraph(Graph):
    """Undirected graph (graph.hpp:285) — both directions made adjacent."""

    def add_edge(self, source: int, sink: int, weight: int = 0) -> None:
        key = (min(source, sink), max(source, sink))
        if key not in self._edges:
            self._edges[key] = weight
            self._add_directed_edge(source, sink)
            self._add_directed_edge(sink, source)
        else:
            self._edges[key] += weight

    def serialize_to_dot(self) -> str:
        lines = ["graph g {"]
        lines += self._node_labels_to_dot()
        lines += self._edges_to_dot("--")
        lines.append("}")
        return "\n".join(lines) + "\n"
