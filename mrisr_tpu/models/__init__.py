from mrisr_tpu.models.simple_cnn import SimpleCNN
from mrisr_tpu.models.mnist_unet import MNISTUNet
from mrisr_tpu.models.resdiff_unet import ResDiffUNet
from mrisr_tpu.models.tokenizer import CLIPBPETokenizer

__all__ = ["SimpleCNN", "MNISTUNet", "ResDiffUNet", "CLIPBPETokenizer"]
