from ampnet_tpu.ops.augment import rotate_z, shuffle_points, shuffle_windows
from ampnet_tpu.ops.sampling import (
    farthest_point_sampling,
    resample_to_fixed_size,
)
