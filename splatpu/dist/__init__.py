from splatpu.dist.mesh import get_mesh, initialize_multihost
from splatpu.dist.sharding import make_camera_sharded_image_losses, pad_views
