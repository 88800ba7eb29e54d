from splatpu.dynamics.network import DeformationNetConfig, deformation_net_apply, init_deformation_net
from splatpu.dynamics.deform import (
    encode_progress,
    normalize_and_encode_means_and_rotations,
    update_cloud_parameters,
)
from splatpu.dynamics.rigidity import (
    ForegroundInfo,
    NeighborInfo,
    build_neighbor_info,
    foreground_info,
    rigidity_loss,
)
