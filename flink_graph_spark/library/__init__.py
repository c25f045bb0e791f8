"""Library algorithms (reference: src/main/java/flink/graphs/library/).

Import submodules explicitly (``from flink_graph_spark.library import
pagerank``) — function names intentionally aren't re-exported here so
they don't shadow the submodule names.
"""

from . import connected_components, jaccard, label_propagation, pagerank, sssp
from .connected_components import ConnectedComponents
from .label_propagation import LabelPropagation
from .pagerank import PageRank
from .sssp import SingleSourceShortestPaths

__all__ = [
    "connected_components",
    "jaccard",
    "label_propagation",
    "pagerank",
    "sssp",
    "ConnectedComponents",
    "LabelPropagation",
    "PageRank",
    "SingleSourceShortestPaths",
]
