from .distributions import (
    chisq_logsf,
    chisq_sf,
    f_logsf,
    gammaln,
    normal_logsf,
    t_logsf,
)
from .hwe import hwe_exact_pvals, hwe_exact_thresh

__all__ = [
    "gammaln",
    "chisq_sf",
    "chisq_logsf",
    "t_logsf",
    "f_logsf",
    "normal_logsf",
    "hwe_exact_pvals",
    "hwe_exact_thresh",
]
