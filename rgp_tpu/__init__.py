"""rgp_tpu — a TPU-native Recurrent Gaussian Process inference engine.

Built from scratch per SURVEY.md: the capabilities of the GPy-based reference
``zhenwendai/RGP`` (REVARB deep recurrent sparse-GP state-space models,
Mattos/Dai et al., ICLR 2016) re-architected for TPU — pure-functional JAX
models, MXU psi-statistics, Pallas hot kernels, and mesh-sharded VI/MCMC/SMC.

Public surface (SURVEY.md Appendix B):

    import rgp_tpu as rgp
    cfg    = rgp.DeepRGP(wins=[0, 20], u_win=20, y_dim=Dy, u_dim=Du,
                         num_inducing=100, back_cstr=False)
    params = rgp.init(cfg, Y, U)
    fit    = rgp.fit(lambda p: -rgp.elbo(cfg, p, Y, U), params, iters=10_000)
    sim    = rgp.freerun(cfg, fit.params, Y, U, U_test)      # means + vars
    post   = rgp.sample_nuts(cfg, fit.params, Y, U, key, n_chains=8)
    traj   = rgp.smc(cfg, fit.params, Y, U, U_test, Y_test, key,
                     n_particles=1024, mesh=mesh)
"""

from . import kernels, linalg, params
from .data import datasets
from .data.windows import Standardizer, narx_design
from .models import gp, gp_narx, rgp as _rgp_model, sparse_gp, svgp
from .models.rgp import RGPConfig, deep_rgp_config as DeepRGP, elbo, freerun
from .models.rgp import init_params as init
from .ops.psi_stats import PsiStats, psi_statistics
from .parallel.mesh import data_parallel_collapsed_elbo, init_distributed, make_mesh
from .sample.api import sample_hmc, sample_nuts, smc
from .sample.nuts import nuts_sample
from .sample.smc import smc_filter, smc_filter_sharded, systematic_resample
from .train import fit_adam as fit, fit_scipy_lbfgs

__version__ = "0.1.0"

__all__ = [
    "DeepRGP",
    "RGPConfig",
    "init",
    "elbo",
    "freerun",
    "fit",
    "fit_scipy_lbfgs",
    "sample_nuts",
    "sample_hmc",
    "smc",
    "nuts_sample",
    "make_mesh",
    "init_distributed",
    "psi_statistics",
    "PsiStats",
    "Standardizer",
    "narx_design",
    "datasets",
    "kernels",
    "linalg",
    "params",
    "gp",
    "sparse_gp",
    "svgp",
    "gp_narx",
]
