from tpuseg.tools.spectral import (  # noqa: F401
    calculate_spectral_gap,
    kronecker_eigen_check,
    mask_bipartite_adjacency,
)
from tpuseg.tools.stats import get_sparsity_stats, get_matrix_shapes  # noqa: F401
