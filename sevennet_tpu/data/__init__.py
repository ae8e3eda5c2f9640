from .graph import GraphBatch, batch_graphs, graph_from_arrays
from .neighborlist import neighbor_list_numpy

__all__ = [
    "GraphBatch",
    "batch_graphs",
    "graph_from_arrays",
    "neighbor_list_numpy",
]
