from .strength import strength_graph
from .aggregation import (vmb_aggregation, hem_aggregation, mis_aggregation,
                          mwm_aggregation, hec_aggregation)
from .prolongation import (tentative_prolongator, smoothed_prolongator,
                           filtered_matrix)
from .hierarchy import MGLevel, MGPreconditioner, setup_amg, as_operator

__all__ = ["strength_graph", "vmb_aggregation", "hem_aggregation",
           "mis_aggregation", "mwm_aggregation", "hec_aggregation",
           "tentative_prolongator",
           "smoothed_prolongator", "filtered_matrix",
           "MGLevel", "MGPreconditioner", "setup_amg", "as_operator"]
