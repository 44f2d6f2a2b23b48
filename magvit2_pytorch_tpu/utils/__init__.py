from magvit2_pytorch_tpu.utils.helpers import (
    exists,
    default,
    identity,
    pair,
    cast_tuple,
    divisible_by,
    is_odd,
    safe_get_index,
    l2norm,
    append_dims,
)
from magvit2_pytorch_tpu.utils.precision import Policy, default_policy, bf16_policy
