from .graph import GraphState, empty_graph
from .refimpl import RefHnswIndex

__all__ = ["GraphState", "empty_graph", "RefHnswIndex"]
