"""rgp_tpu — a TPU-native Recurrent Gaussian Process inference engine.

Built from scratch per SURVEY.md: the capabilities of the GPy-based reference
``zhenwendai/RGP`` (REVARB deep recurrent sparse-GP state-space models,
Mattos/Dai et al., ICLR 2016) re-architected for TPU — pure-functional JAX
models, MXU psi-statistics, Pallas hot kernels, and mesh-sharded VI/MCMC/SMC.
"""

from . import kernels, linalg, params
from .ops.psi_stats import PsiStats, psi_statistics

__version__ = "0.1.0"
