from splatpu.dist.mesh import get_mesh, initialize_multihost
from splatpu.dist.sharding import camera_sharded_loss_and_grads
