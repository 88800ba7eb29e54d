from splatpu.core.types import (
    Camera,
    GaussianCloud,
    RenderArgs,
    cloud_from_arrays,
)
from splatpu.core.quaternion import (
    build_rotation,
    quat_conjugate,
    quat_mult,
    quat_normalize,
)
from splatpu.core.ssim import ssim
from splatpu.core.encoding import positional_encoding
from splatpu.core import projection
