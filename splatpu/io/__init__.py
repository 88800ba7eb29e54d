from splatpu.io.checkpoint import (
    load_checkpoint,
    load_cloud,
    save_checkpoint,
    save_cloud,
)
