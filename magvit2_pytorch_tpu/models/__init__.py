from magvit2_pytorch_tpu.models.discriminator import (
    Discriminator,
    DiscriminatorBlock,
    MultiscaleDiscriminator,
)
from magvit2_pytorch_tpu.models.layerspec import ParsedLayers, parse_layers
from magvit2_pytorch_tpu.models.tokenizer import MagViT2, VideoTokenizer
from magvit2_pytorch_tpu.models.tokenizer_module import (
    TokenizerConfig,
    TokenizerModule,
)
from magvit2_pytorch_tpu.models.vgg import VGG16Features
