from matcha_tpu.ops.mas import maximum_path, maximum_path_numpy  # noqa: F401
from matcha_tpu.ops.seq import (  # noqa: F401
    denormalize,
    duration_loss,
    fix_len_compatibility,
    generate_path,
    normalize,
    sequence_mask,
)
