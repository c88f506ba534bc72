from . import mesh, sharded, training
from .mesh import make_mesh, points_sharding, replicated_sharding
from .sharded import shard_points, sharded_matvec_dense, sharded_dot
from .training import make_sharded_train_step, shard_training_data, train_sharded
