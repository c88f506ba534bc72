from . import mesh, sharded
from .mesh import make_mesh, points_sharding, replicated_sharding
from .sharded import shard_points, sharded_matvec_dense, sharded_dot
