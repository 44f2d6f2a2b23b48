from magvit2_pytorch_tpu.training.losses import (
    DiscrLossBreakdown,
    LossBreakdown,
    discriminator_loss,
    gradient_penalty,
    hinge_discr_loss,
    hinge_gen_loss,
    pick_video_frame,
    tokenizer_loss,
)
