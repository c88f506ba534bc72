from . import config, datasets, pytree
from .config import default_real_dtype
from .datasets import generate_uniform, generate_grid2d, rand_perm, expand_perm
