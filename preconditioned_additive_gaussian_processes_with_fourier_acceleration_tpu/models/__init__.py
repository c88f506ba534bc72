from . import transforms, adam, gp
from .transforms import transform_forward, transform_inverse
from .adam import AdamState, adam_init, adam_step, adam_run
from .gp import GPConfig, gp_loss, gp_predict, make_dense_ops
