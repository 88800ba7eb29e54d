from splatpu.growth.densify import (
    DensifyConfig,
    DensifyStats,
    accumulate_stats,
    densify_and_prune,
    init_stats,
    reset_opacity,
)
