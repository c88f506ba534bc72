from . import chol, nystrom, fsai, afn
from .chol import CholPrecond, chol_setup
from .nystrom import NystromPrecond, nystrom_setup
from .fsai import FsaiPrecond, fsai_setup
from .afn import AfnPrecond, afn_setup
