"""flink_graph_spark — a PySpark-native graph analytics engine with the
capabilities of andralungu/flink-graph (Flink Gelly prototype), built
from scratch on the DataFrame/SQL stack. See SURVEY.md.
"""

from .graph import EdgeDirection, Graph, GraphAlgorithm, InvalidGraphError

__all__ = ["Graph", "GraphAlgorithm", "EdgeDirection", "InvalidGraphError"]
__version__ = "0.1.0"
