"""magvit2_pytorch_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the MagViT2
video tokenizer with the capabilities of lucidrains/magvit2-pytorch.

Public surface mirrors the reference's three exports
(/root/reference/magvit2_pytorch/__init__.py:1-8) plus the TPU-native extras.
"""

from magvit2_pytorch_tpu.version import __version__

__all__ = ['__version__']


def __getattr__(name):
    # heavyweight model/trainer imports are lazy so `import magvit2_pytorch_tpu`
    # stays cheap for ops-only users
    if name in ('VideoTokenizer', 'MagViT2'):
        from magvit2_pytorch_tpu.models import tokenizer as _t
        return getattr(_t, name)
    if name == 'VideoTokenizerTrainer':
        from magvit2_pytorch_tpu.training.trainer import VideoTokenizerTrainer
        return VideoTokenizerTrainer
    raise AttributeError(name)
