"""Public engine facade (SURVEY.md §3.5) — the slmpy-shaped API,
Sparkified: every function takes/returns DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from slmpy_spark.graph.components import connected_components
from slmpy_spark.graph.edges import (
    degrees,
    in_degrees,
    init_singletons,
    normalize_edges,
    out_degrees,
    symmetrize,
    total_weight,
    vertices,
)
from slmpy_spark.graph.labelprop import label_propagation
from slmpy_spark.graph.pagerank import pagerank
from slmpy_spark.graph.slm import slm, slm_exact, slm_scale
from slmpy_spark.graph.triangles import triangle_count, triangles
from slmpy_spark.sources.docs import documents_to_edges
from slmpy_spark.sources.pages import (
    page_links,
    pages_text,
    pages_to_edges,
    url_ids,
)

__all__ = [
    "pages_to_edges",
    "page_links",
    "pages_text",
    "url_ids",
    "documents_to_edges",
    "normalize_edges",
    "symmetrize",
    "vertices",
    "degrees",
    "out_degrees",
    "in_degrees",
    "total_weight",
    "init_singletons",
    "slm",
    "slm_exact",
    "slm_scale",
    "louvain",
    "modularity",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangles",
]


def louvain(edges: DataFrame, **kw):
    """Louvain community detection (SLM minus subnetwork splitting)."""
    kw.setdefault("variant", "louvain")
    return slm(edges, **kw)


def modularity(edges: DataFrame, assign: DataFrame, gamma: float = 1.0,
               quality: str = "modularity") -> float:
    """Q of an assignment on the (directed) edge table; symmetrizes
    internally (SURVEY §2.2)."""
    from slmpy_spark.graph.modularity import modularity as _q

    return _q(symmetrize(edges), assign, gamma=gamma, quality=quality)
