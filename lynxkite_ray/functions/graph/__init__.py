from .core import DatasetGraph, Graph  # noqa: F401
from .pagerank import pagerank, pagerank_dataset  # noqa: F401
from .components import connected_components, connected_components_dataset  # noqa: F401
from .labelprop import label_propagation, label_propagation_dataset  # noqa: F401
from .triangles import embeddedness, triangle_count, triangles_per_vertex  # noqa: F401
from .kcore import core_number, k_core  # noqa: F401
from .scc import strongly_connected_components  # noqa: F401
from .metrics import adamic_adar, degree_assortativity, reciprocity  # noqa: F401
from .bowtie import bowtie  # noqa: F401
from .pagerank import personalized_pagerank  # noqa: F401
from .hits import hits  # noqa: F401
from .katz import eigenvector_centrality, katz  # noqa: F401
from .steiner import steiner_tree  # noqa: F401
