from . import pcg, fgmres, lanczos
from .pcg import pcg as pcg_solve
from .fgmres import fgmres as fgmres_solve
from .lanczos import lanczos as lanczos_solve, slq_logdet
