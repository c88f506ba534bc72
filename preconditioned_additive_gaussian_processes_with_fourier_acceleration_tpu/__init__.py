"""NFFT4GP-TPU: TPU-native preconditioned additive Gaussian processes with Fourier acceleration.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
C library (Hitenze/Preconditioned_Additive_Gaussian_Processes_with_Fourier_Acceleration):

- kernel matrices (Gaussian / Matérn-3/2 / Matérn-1/2) with analytic gradients
  w.r.t. (f, l, mu), including additive kernels over feature windows
  (ref: SRC/linearalg/kernels.c)
- O(n log n)-style fast kernel matvecs via a separable nonequispaced DFT /
  Fourier "fastsum" plan (ref: SRC/external/nfft_interface.c)
- preconditioners: dense Cholesky, FSAI, stabilized Nyström, AFN
  (ref: SRC/preconds/, MATLAB/+nfftgp/+kernels/+preconds)
- Krylov solvers: PCG, FGMRES, preconditioned Lanczos, stochastic Lanczos
  quadrature for logdet + gradient traces (ref: SRC/solvers/)
- GP training: softplus transforms, analytic-gradient marginal likelihood,
  Adam, GP prediction with predictive std (ref: SRC/optimizer/)
- multi-chip scaling via jax.sharding Mesh + collectives (new; the reference
  is OpenMP-only single node)

Everything is pure-functional JAX: a fast kernel matrix IS a pytree plan,
solvers are fixed-shape lax.while_loops generic over matvec/precond callables.
"""

from . import utils, ops, solvers, preconds, models, parallel

__version__ = "0.1.0"

# Convenience re-exports of the primary user-facing API.
from .ops.kernels import (
    KernelParams,
    gaussian_kernel,
    matern32_kernel,
    matern12_kernel,
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
    make_windows,
)
from .solvers.pcg import pcg
from .solvers.fgmres import fgmres
from .solvers.lanczos import lanczos, slq_logdet
from .preconds.chol import CholPrecond, chol_setup
from .preconds.nystrom import NystromPrecond, nystrom_setup
from .preconds.fsai import FsaiPrecond, fsai_setup
from .preconds.afn import AfnPrecond, afn_setup
from .models.transforms import transform_forward, transform_inverse
from .models.gp import GPConfig, gp_loss, gp_predict
from .models.adam import AdamState, adam_init, adam_step
