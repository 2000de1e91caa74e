from cnc_visionsearch_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_normalize,
    l2_sq,
)

__all__ = ["dot", "l2_norm", "l2_normalize", "l2_sq", "cosine_sim"]
