from magvit2_pytorch_tpu.ops.conv import (
    CausalConv3d,
    CausalConvTranspose3d,
    Conv2d,
    Conv3DMod,
    Conv3d1x1,
    SameConv2d,
    blur,
)
from magvit2_pytorch_tpu.ops.basic import (
    FeedForward,
    GEGLU,
    Linear,
    Residual,
    Sequential,
    SqueezeExcite,
    TokenShift,
    leaky_relu,
)
from magvit2_pytorch_tpu.ops.norms import AdaptiveRMSNorm, LayerNorm, RMSNorm
from magvit2_pytorch_tpu.ops.attend import (
    attend,
    get_default_attend_backend,
    set_default_attend_backend,
)
from magvit2_pytorch_tpu.ops.attention import (
    Attention,
    LinearAttention,
    LinearSpaceAttention,
    SpaceAttention,
    TaylorSeriesLinearAttn,
    TimeAttention,
)
from magvit2_pytorch_tpu.ops.gateloop import (
    SimpleGateLoopLayer,
    ToTimeSequence,
    gated_linear_recurrence,
)
from magvit2_pytorch_tpu.ops.resample import (
    ResidualUnit,
    ResidualUnitMod,
    SpatialDownsample2x,
    SpatialUpsample2x,
    TimeDownsample2x,
    TimeUpsample2x,
)
